"""Speed-of-light HBM-traffic model for the ShuffleNet U-Net forward.

Computes the bytes each sampler mode must move per forward at a given
image/batch/base_dim, assuming perfect fusion inside each launch:
- 'xla spec'  : BN-folded shift-add path — every op's I/O round-trips HBM
                (XLA fuses elementwise into convs; convs re-read padded
                activations; we count 1R+1W per bottleneck branch op set,
                the measured ~5x multiplier is noted in DESIGN.md)
- 'packed v2' : one launch per unit: k units -> k (R+W) of the stage tensor
- 'chain v3'  : one launch per BLOCK: stage tensor R once (+2k/th halo),
                shortcut W once, downsample W once; decoder reads the
                half-res input + skip, writes the block output; init/final
                convs fused into the first/last blocks.

Usage: python tools/sol_model.py [H W B base_dim]
"""
import sys

H, W, B, D = (int(a) for a in (sys.argv[1:] + [256, 96, 16, 64][len(sys.argv) - 1:]))
BPE = 2  # bf16
MULTS = (1, 2, 4, 8)


def mb(x):
    return x / 2 ** 20


def main():
    dims = [D * m for m in MULTS]
    # stage i tensor: after enc block i's chain (pre-downsample)
    sizes, hw = [], (H, W)
    for c in dims:
        sizes.append(B * hw[0] * hw[1] * c * BPE)
        hw = (hw[0] // 2, hw[1] // 2)
    mid = B * hw[0] * hw[1] * dims[-1] * BPE

    raw = B * H * W * 1 * BPE
    out = raw

    # chain v3 (whole-block launches)
    v3 = 0.0
    prev = raw
    for s in sizes:                      # enc blocks
        v3 += prev + s + s / 2           # R input, W shortcut, W down(=s/2: half res double ch)
        prev = s / 2
    v3 += prev * 2                       # mid chain R+W
    for s in reversed(sizes):            # dec blocks: R half-res prev + R skip + W out
        o = s / 2                        # dec out = half the concat width at full res
        v3 += prev + s + o
        prev = o
    v3 = v3 - prev + out                 # last block writes only the projection

    # packed v2: per-unit launches, k=4 enc / 5 dec units + separate
    # downsample / time / resize / init / final ops
    v2 = raw + sizes[0]                  # init conv
    prev = sizes[0]
    for s in sizes:
        v2 += 4 * 2 * s                  # 4 units R+W
        v2 += 2 * s                      # time mlp R+W
        v2 += s + s / 2                  # downsample R, W
        prev = s / 2
    v2 += 3 * 2 * mid
    for s in reversed(sizes):
        v2 += prev + s                   # resize R half, W full
        v2 += 2 * s                      # concat/pack relayout
        v2 += 5 * 2 * s                  # 5 units
        v2 += 2 * s                      # time mlp
        prev = s / 2
    v2 += sizes[0] + out                 # final conv

    # xla spec: like v2 but each bottleneck is ~6 fused op groups -> ~3x unit traffic
    spec = v2 + sum(4 * 4 * s for s in sizes) + sum(5 * 4 * s for s in sizes)

    print(f"image {H}x{W}x1 batch {B} base {D} (bf16)")
    for name, v in (("xla spec (approx)", spec), ("packed v2", v2),
                    ("chain v3 fused", v3)):
        print(f"  {name:18s} {mb(v):8.1f} MB/forward")
    print(f"  v5e @819GB/s floor: chain {1e3 * v3 / 819e9 * 2**0:.3f} ms/fwd"
          f" -> {819e9 / v3:.0f} denoise steps/s roofline")


def discrete_posterior():
    """HBM-traffic model for one discrete reverse-sampler step (per-step
    work between denoiser logits and sampled indices), XLA vs the fused
    kernel (ops/discrete_posterior_pallas.py). Transformer-prior shape."""
    B, N, K = 16, 256, 1025
    s = B * N * K * 4                      # one K-wide f32 pass
    # XLA (structured q_posterior_idx path): log_softmax (R+W ~3 passes),
    # q construct+normalize (~3), q_pred(q,t-1) (~3), +log_qt_one/clip (~1),
    # gumbel gen+add+argmax (~3)  => ~13 passes best-case after fusion ~8
    xla = 8 * s
    # fused kernel: logits read + gumbel read + index write
    fused = 2 * s + B * N * 4
    print(f"discrete posterior step B{B} N{N} K{K}:")
    for name, v in (("xla (fused est.)", xla), ("pallas fused", fused)):
        print(f"  {name:18s} {mb(v):8.2f} MB/step"
              f"  @819GB/s -> {1e6 * v / 819e9:7.1f} us/step")
    print(f"  predicted kernel speedup on the posterior part: {xla/fused:.1f}x")


if __name__ == "__main__":
    main()
    discrete_posterior()
