#!/usr/bin/env python
"""Data-pipeline throughput: native C++ prefetcher vs the Python loader.

CPU-only (no TPU needed): measures steady-state images/s of
(a) the Python thread-pool ``DataLoader`` (decode + normalize per epoch) and
(b) the mmap'd ``NativeDataLoader`` (libsampledb.so: pinned worker threads,
    fused uint8→f32 normalize, epoch reshuffle in C++).

Reference counterpart: torchvision + torch.utils.data.DataLoader with the
custom label-dropping collate (reference dataloader/, utils.py:93-100) — the
reference ships no native loader; this one exists because on TPU the input
pipeline must outrun a ~10k img/s/chip train step without stealing host
cores from dispatch.

Writes one JSON line; appended to BENCHMARKS.md by hand.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096, help="dataset size")
    ap.add_argument("--img", type=int, default=32)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=8, help="timed epochs")
    ap.add_argument("--augment", action="store_true",
                    help="train-recipe augmentation on both sides "
                         "(flips + random <=25 deg rotation)")
    args = ap.parse_args()

    from vq_vae_gan_diffusion_tpu.data import (DataLoader, Preprocessor,
                                               SyntheticDataset)
    from vq_vae_gan_diffusion_tpu.data import native_loader as native

    ds = SyntheticDataset(args.n, args.img, 3, seed=0)
    prep = Preprocessor(args.img, (0.5,) * 3, (0.5,) * 3,
                        augment=args.augment)

    def run_epochs(make_iter, epochs: int) -> float:
        t0 = time.perf_counter()
        seen = 0
        for _ in range(epochs):
            for batch in make_iter():
                seen += batch.shape[0]
        return seen / (time.perf_counter() - t0)

    py = DataLoader(ds, args.batch, prep, shuffle=True, seed=1)
    run_epochs(lambda: iter(py), 1)                       # warm
    py_ips = run_epochs(lambda: iter(py), args.epochs)

    out = {"python_loader_img_per_s": round(py_ips, 1),
           "n": args.n, "img": args.img, "batch": args.batch,
           "augment": bool(args.augment)}

    if native.is_available():
        path = os.path.join(tempfile.mkdtemp(), "bench.sdb")
        t0 = time.perf_counter()
        native.build_sample_store(ds, path)
        out["store_build_s"] = round(time.perf_counter() - t0, 2)
        aug = (dict(p_hflip=0.2, p_vflip=0.2, p_rot=0.3, max_deg=25.0)
               if args.augment else {})
        nl = native.NativeDataLoader(path, args.batch, mean=(0.5,) * 3,
                                     std=(0.5,) * 3, seed=1, **aug)
        run_epochs(lambda: iter(nl), 1)                   # warm
        nat_ips = run_epochs(lambda: iter(nl), args.epochs)
        nl.close()
        out["native_loader_img_per_s"] = round(nat_ips, 1)
        out["native_speedup"] = round(nat_ips / py_ips, 2)
    else:
        out["native_loader_img_per_s"] = None

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
