"""Strong-ascent validation of a trained grasp checkpoint (1024 guesses,
32 steps) — reduces ascent variance for the final reported errors.

  python tools/strong_goal_validation.py [config] [model_path] [backbone_path]
"""
import os, sys, numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from tcnerf.train.config import load_config
from tcnerf.train import grasp_common as G
from tcnerf.train.session import validate, log_results
from tcnerf.data.loaders import load_dataset_baseline
from tcnerf.models import checkpoint as ckpt
from tcnerf.models import grasp_training as GT

CONFIG = sys.argv[1] if len(sys.argv) > 1 else 'goal_convergence_cpu'
MODEL = (sys.argv[2] if len(sys.argv) > 2
         else '/tmp/convcpu/storage/models/grasp/convergence_cpu_1obj64')
BACKBONE = (sys.argv[3] if len(sys.argv) > 3
            else '/tmp/convcpu/storage/models/nerf/convergence_cpu3')
cfg = load_config(os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), 'tcnerf', 'configs'), CONFIG,
                  ['data_dir=/tmp/convcpu', 'ws_dir=/tmp/convcpu',
                   f'grasp_training.model_path={MODEL}',
                   f'grasp_training.backbone_path={BACKBONE}',
                   'validation.grasp_opt_config.optimizer_config.n_initial_guesses=1024',
                   'validation.grasp_opt_config.optimization_config.n_optimization_steps=32'])
valid_dataset = load_dataset_baseline(path=cfg.dataset.path,
                                      n_perspectives=cfg.dataset.n_perspectives,
                                      dataset_type='valid')
model = G.build_grasp_model(cfg)
from tcnerf.data.generators import GraspMVNeRFDataGenerator
train_dataset = load_dataset_baseline(path=cfg.dataset.path,
                                      n_perspectives=cfg.dataset.n_perspectives,
                                      dataset_type='train')
gen = GraspMVNeRFDataGenerator(
    train_dataset,
    workspace_bounds=[list(b) for b in cfg.generator_grasp.workspace_bounds],
    n_views=cfg.nerf_model.n_views,
    n_points_train=cfg.generator_grasp.n_points_train,
    batch_size=cfg.grasp_training.batch_size,
    n_r_fraction=cfg.generator_grasp.get('n_r_fraction', 4), rng=0)
sample_inputs, _ = gen[0]
state = G.init_grasp_state(model, cfg, sample_inputs, 0)
state, ok = G.load_backbone(state, cfg)
assert ok
best = ckpt.load(os.path.join(MODEL, 'best'), state.params,
                 ckpt.GRASP_COMPONENTS)
assert best is not None
state = state.replace(params=best)
opt = G.build_pose_optimizer(model, state, cfg)
oracle = G.build_oracle(cfg)
vd = G.collect_valid_data(valid_dataset, cfg, model, state)
rng = np.random.default_rng(0)
results = validate(opt, dict(cfg.validation.grasp_opt_config.optimization_config),
                   vd, oracle, rng)
log_results('strong', results, False)
