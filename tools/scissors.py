#!/usr/bin/env python
"""Result-figure cutter (reference ``tools/Scissors.py`` — which hardcoded
cluster run paths; this one takes arguments).

Cuts saved comparison grids (original|reconstruction rows produced by the
workers) into per-panel figures for papers/reports::

    python tools/scissors.py RUN_DIR/val_recon_epoch5.jpg --rows 2 --cols 16 \
        --out-dir figures/
"""

from __future__ import annotations

import argparse
import os


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("grid", help="grid image produced by a worker")
    parser.add_argument("--rows", type=int, required=True)
    parser.add_argument("--cols", type=int, required=True)
    parser.add_argument("--pad", type=int, default=2,
                        help="grid padding used by utils.make_grid")
    parser.add_argument("--out-dir", default="figures")
    args = parser.parse_args()

    import numpy as np
    from PIL import Image

    img = np.asarray(Image.open(args.grid))
    pad = args.pad
    h = (img.shape[0] - pad) // args.rows - pad
    w = (img.shape[1] - pad) // args.cols - pad
    os.makedirs(args.out_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.grid))[0]
    n = 0
    for r in range(args.rows):
        for c in range(args.cols):
            y = r * (h + pad) + pad
            x = c * (w + pad) + pad
            panel = img[y:y + h, x:x + w]
            Image.fromarray(panel).save(
                os.path.join(args.out_dir, f"{base}_r{r}_c{c}.png"))
            n += 1
    print(f"wrote {n} panels to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
