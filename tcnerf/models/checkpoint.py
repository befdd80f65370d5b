"""Per-component checkpointing.

Keeps the reference's checkpoint *layout* — one file per component with
suffixes `_coarse_embedding`, `_fine_embedding`, `_visual_features`, ... and a
load that verifies every component exists before touching the model
(reference: src/lib/mvnerf/model_v0.py:199-240, grasp load_backbone
src/lib/grasp_mvnerf/model.py:67-82) — serialized with flax msgpack instead of
TF checkpoint shards.

Two-tier scheme ('model_final' latest + 'best' by error score) is implemented
by the training sessions in tcnerf.train.session.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional

import flax.serialization
import jax

RENDERER_COMPONENTS = ("coarse_embedding", "coarse_readout", "fine_embedding",
                       "fine_readout", "visual_features", "combine_clip_visual")
RENDERER_WITHOUT_COMPONENTS = ("coarse_embedding", "coarse_readout",
                               "fine_embedding", "fine_readout", "visual_features")
GRASP_COMPONENTS = ("fine_embedding", "visual_features", "grasp_readout",
                    "hash_tables")
BACKBONE_COMPONENTS = ("fine_embedding", "visual_features")

SUFFIX = ".msgpack"


def component_path(path: str, component: str, suffix: str = SUFFIX) -> str:
    return f"{path}_{component}{suffix}"


def store(path: str, params: Dict, components: Iterable[str]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    for component in components:
        if component not in params:
            continue
        blob = flax.serialization.to_bytes(jax.device_get(params[component]))
        with open(component_path(path, component), "wb") as f:
            f.write(blob)


def exists(path: str, components: Iterable[str]) -> bool:
    return all(os.path.exists(component_path(path, c)) for c in components)


def load(path: str, params: Dict, components: Iterable[str],
         verbose: bool = False) -> Optional[Dict]:
    """Return params with the listed components replaced, or None if any file
    is missing (all-or-nothing, like the reference's .index checks).
    Components the model does not have (e.g. `hash_tables` on a non-hash
    grasp field) are ignored — `store` skips them symmetrically.

    Falls back to reference-format TF checkpoints: when the msgpack files
    are absent but `<path>_<component>.index` tensor bundles exist (keras
    save_weights output, reference model_v0.py:199-240), they are imported
    via the pure-python bundle reader in tcnerf.models.tf_checkpoint."""
    components = [c for c in components if c in params]
    if not exists(path, components):
        if all(os.path.exists(component_path(path, c, ".index"))
               for c in components):
            return load_tf(path, params, components)
        if verbose:
            missing = [c for c in components
                       if not os.path.exists(component_path(path, c))]
            print(f"checkpoint components missing at {path}: {missing}")
        return None
    new_params = dict(params)
    for component in components:
        with open(component_path(path, component), "rb") as f:
            blob = f.read()
        new_params[component] = flax.serialization.from_bytes(
            params[component], blob)
    return new_params


def load_tf(path: str, params: Dict, components: Iterable[str]) -> Dict:
    """Import reference-format (TF tensor-bundle) per-component checkpoints."""
    from . import tf_checkpoint as tfc

    new_params = dict(params)
    for component in components:
        new_params[component] = tfc.import_component(
            component_path(path, component, ""), params[component])
    return new_params


def store_meta(path: str, meta: Dict) -> None:
    """Sidecar metadata (`<path>_meta.json`) recording the model flavor the
    checkpoint was trained with — the param tree alone cannot distinguish an
    activation-only flavor difference (e.g. a v4 decoder trained with relu
    deserializes cleanly into the elu decoder the grasp stage hardcodes and
    runs with the wrong nonlinearity; ADVICE r3)."""
    import json

    with open(f"{path}_meta.json", "w") as f:
        json.dump(meta, f)


def load_meta(path: str) -> Optional[Dict]:
    import json

    try:
        with open(f"{path}_meta.json") as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def store_tf(path: str, params: Dict, components: Iterable[str]) -> None:
    """Export components in the reference's TF tensor-bundle layout so
    reference tooling can consume tcnerf-trained weights."""
    from . import tf_checkpoint as tfc

    for component in components:
        if component not in params:
            continue
        tfc.export_component(component_path(path, component, ""),
                             jax.device_get(params[component]))
