"""Would Morton/Z-order pixel keys shrink the sorted-window kernel's windows?

The swg kernel (ops/pallas/swg.py) sorts sample queries by the row-major
pixel index of their bilinear top-left corner and DMAs, per 128-query
subgroup, a window of ka*128 consecutive image rows (twice: y0 and y1=y0+1
row streams).  The coarse stage needs ka_c=12 windows (docs/perf_notes.md
round 3) because its query density is half the fine stage's — window DMA is
the coarse stage's bottleneck (~15.3 ns/sample vs the fine stage's 5.7).

Hypothesis (perf_notes "Next serving candidates"): sorting by a Morton
(bit-interleaved y,x) key over a Morton-tiled image layout makes 128
consecutive sorted queries cover a compact 2D tile instead of a thin raster
band, shrinking the window span.  Complication: the 4 bilinear corners are
no longer at fixed offsets (+1, +w_pad), so a Morton kernel must gather from
a corner-stacked image (4x row width -> 4x DMA per window row) and cannot
share one triangle between corner pairs.  Morton therefore only wins if the
span (hence window) shrinks by MORE than the DMA-width penalty:

    row-major DMA / subgroup = 2 streams x win_row   x 128 feats
    morton    DMA / subgroup = 1 stream  x win_morton x 512 feats
    -> morton wins iff win_morton < win_row / 2        (same feat dtype)

This probe measures exactly that on the bench's honest geometry (the same
camera ring + random-target-pixel rays bench.py uses), for the coarse
(uniform z, the DMA-bound stage) and a fine-like stage.  Spans are the
max-min over the union of all four corner keys per 128-query subgroup —
the quantity the window capacity must actually cover.

Run on CPU:  PYTHONPATH= python tools/morton_span_probe.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def morton_encode(y: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Interleave bits of (y, x) -> z-order code, x in the low lane."""
    def spread(v):
        v = v.astype(np.uint32)
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v
    return (spread(y) << 1) | spread(x)


def subgroup_spans(keys_corner4: np.ndarray, order_key: np.ndarray,
                   sub: int = 128) -> np.ndarray:
    """Sort queries by order_key; per aligned subgroup of `sub` consecutive
    sorted queries, the span the window must cover = max over the 4 corner
    keys - min over the 4 corner keys."""
    order = np.argsort(order_key, kind="stable")
    c = keys_corner4[order]                      # [N, 4]
    n = (c.shape[0] // sub) * sub
    c = c[:n].reshape(-1, sub, 4)
    return c.max(axis=(1, 2)) - c.min(axis=(1, 2))


def main():
    import jax
    from tcnerf.core.rays import get_specific_rays
    from tcnerf.core.projection import project_points_mv
    from tcnerf.data.synthetic import camera_ring

    h, w = 480, 640
    n_rays, n_coarse, n_fine = 8192, 64, 128
    near, far = 0.3, 1.3
    rng = np.random.default_rng(0)

    cfg, tgt = camera_ring(2, height=h, width=w)[:2]
    k4 = np.eye(4, dtype=np.float32)
    k4[:3, :3] = cfg["intrinsics"].reshape(3, 3)
    ext_inv = np.linalg.inv(cfg["pose"]).astype(np.float32)

    pix_x = rng.uniform(0, w - 1, n_rays).astype(np.float32)
    pix_y = rng.uniform(0, h - 1, n_rays).astype(np.float32)
    ro, rd = get_specific_rays(pix_x, pix_y, tgt["pose"],
                               tgt["intrinsics"].reshape(3, 3))

    def corner_keys(z):                           # z: [R, S]
        pts = (np.asarray(ro)[:, None] + z[..., None] * np.asarray(rd)[:, None])
        flat = pts.reshape(-1, 3)
        xy, _cam = project_points_mv(
            jax.numpy.asarray(flat[None, :, None, :]),
            jax.numpy.asarray(k4[None, None]),
            jax.numpy.asarray(ext_inv[None, None]))
        xy = np.asarray(xy)[0, 0, :, 0, :]
        x = np.clip(xy[:, 0], 0.0, w - 1.0)
        y = np.clip(xy[:, 1], 0.0, h - 1.0)
        x0 = np.clip(np.floor(x), 0, w - 2).astype(np.int64)
        y0 = np.clip(np.floor(y), 0, h - 2).astype(np.int64)
        row4 = np.stack([y0 * w + x0, y0 * w + x0 + 1,
                         (y0 + 1) * w + x0, (y0 + 1) * w + x0 + 1], -1)
        mor4 = np.stack([morton_encode(y0, x0).astype(np.int64),
                         morton_encode(y0, x0 + 1).astype(np.int64),
                         morton_encode(y0 + 1, x0).astype(np.int64),
                         morton_encode(y0 + 1, x0 + 1).astype(np.int64)], -1)
        return row4, mor4

    # coarse stage: stratified-uniform z (what sample_along_ray produces)
    t = (np.arange(n_coarse) + rng.uniform(size=(n_rays, n_coarse))) / n_coarse
    z_coarse = (near + (far - near) * t).astype(np.float32)
    # fine-like stage: 128 z's clustered around a random per-ray depth peak
    # (the pdf-resampled distribution the real fine stage produces on the
    # bench's random-image weights), sigma ~ an eighth of the range
    peak = rng.uniform(near, far, size=(n_rays, 1)).astype(np.float32)
    z_fine = np.clip(peak + rng.normal(size=(n_rays, n_fine)).astype(np.float32)
                     * (far - near) / 8.0, near, far)
    z_fine.sort(axis=-1)

    print(f"{'stage':8} {'order':7} {'p50':>8} {'p90':>8} {'p99':>8} {'max':>8}"
          f"  (span over 4-corner union, pixel units, 128-query subgroups)")
    results = {}
    for stage, z in (("coarse", z_coarse), ("fine", z_fine)):
        row4, mor4 = corner_keys(z)
        for name, c4 in (("row", row4), ("morton", mor4)):
            spans = subgroup_spans(c4, c4[:, 0])
            q = np.percentile(spans, [50, 90, 99, 100])
            results[(stage, name)] = q
            print(f"{stage:8} {name:7} {q[0]:8.0f} {q[1]:8.0f} {q[2]:8.0f}"
                  f" {q[3]:8.0f}")

    for stage in ("coarse", "fine"):
        r99, m99 = results[(stage, "row")][2], results[(stage, "morton")][2]
        # zero-overflow window (128-lane groups) each layout needs at p99:
        ka_row = int(np.ceil(r99 / 128.0))
        ka_mor = int(np.ceil(m99 / 128.0))
        dma_row = 2 * ka_row * 128 * 128   # two corner-row streams, 128 feats
        dma_mor = 1 * ka_mor * 128 * 512   # one corner-stacked stream
        print(f"{stage}: p99 window row ka={ka_row} vs morton ka={ka_mor};"
              f" rel DMA morton/row = {dma_mor / dma_row:.2f}"
              f" ({'WIN' if dma_mor < dma_row else 'LOSS'})")


if __name__ == "__main__":
    main()
