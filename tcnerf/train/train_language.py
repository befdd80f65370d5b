"""Language-conditioned grasp-field training (reference src/train_language.py):
DeltaNGF training with CLIP text conditioning through the V4 fusion decoder;
validation forces alternating t/r ascent (sync=False, reference :103-105)."""

from __future__ import annotations

from ..clip.tokenizer import tokenize
from ..data.generators import LanguageDataGenerator
from .config import main_config
from .train_delta_ngf import run_delta_training


@main_config("../configs", "language_1_view")
def main(cfg):
    fusion = cfg.grasp_training.get("fusion", "v4")
    return run_delta_training(cfg, generator_cls=LanguageDataGenerator,
                              sync=False, fusion=fusion, tokenize_fn=tokenize,
                              wandb_project="nerf-manipulation")


if __name__ == "__main__":
    main()
