"""NeRF pretraining without CLIP (ablation) — reference src/train_without.py:
identical to train_nerf with the no-CLIP renderer (upsampled visual features)."""

from __future__ import annotations

from .config import main_config
from .train_nerf import _main


@main_config("../configs", "nerf_1_view_wo")
def main(cfg):
    return _main(cfg, fusion="without")


if __name__ == "__main__":
    main()
