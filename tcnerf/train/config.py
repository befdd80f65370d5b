"""Hydra-style YAML config composition (defaults lists, groups, overrides,
${...} interpolation, dotted CLI overrides).

The reference drives every entry point through Hydra config trees
(src/configs/, src/alt_configs/; e.g. src/configs/nerf_1_view.yaml composes
`default_nerf`, `nerf_model: 1_view`, ... and configs are splatted into model
constructors — config keys ARE the API, SURVEY.md §2.16). This is a small
self-contained implementation of the subset those trees use:

  defaults:
    - default_nerf              # compose another root config
    - nerf_model: 1_view        # compose configs/nerf_model/1_view.yaml under
                                # key 'nerf_model'
    - override dataset: grad    # replace an earlier group choice
  key: value                    # the file's own keys merge last (_self_)

CLI overrides are dotted assignments: `nerf_training.batch_size=4`.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Iterable, List, Union

import yaml

_INTERP = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


class Config(dict):
    """dict with attribute access (OmegaConf-lite)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name, value):
        self[name] = value

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> Dict:
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o
        return unwrap(self)


def _deep_merge(base: Dict, extra: Dict) -> Dict:
    out = dict(base)
    for k, v in extra.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _load_yaml(path: str) -> Dict:
    with open(path) as f:
        data = yaml.safe_load(f)
    return data or {}


def _compose(config_dir: str, name: str) -> Dict:
    path = os.path.join(config_dir, f"{name}.yaml")
    raw = _load_yaml(path)
    defaults = raw.pop("defaults", [])
    merged: Dict = {}
    for entry in defaults:
        if entry == "_self_":
            merged = _deep_merge(merged, raw)
            raw = {}
            continue
        if isinstance(entry, str):
            merged = _deep_merge(merged, _compose(config_dir, entry))
            continue
        if isinstance(entry, dict):
            (key, value), = entry.items()
            group = key[len("override "):] if key.startswith("override ") else key
            if value is None:
                continue
            sub = _compose(os.path.join(config_dir, group), value)
            merged = _deep_merge(merged, {group: sub})
            continue
        raise ValueError(f"Unsupported defaults entry: {entry!r}")
    return _deep_merge(merged, raw)


def _parse_value(text: str) -> Any:
    return yaml.safe_load(text)


def apply_overrides(cfg: Dict, overrides: Iterable[str]) -> Dict:
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override must look like key=value, got {ov!r}")
        key, _, value = ov.partition("=")
        parts = key.lstrip("+").split(".")
        node = cfg
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(value)
    return cfg


def _resolve_path(cfg: Dict, dotted: str):
    node: Any = cfg
    for p in dotted.split("."):
        node = node[p]
    return node


def _interpolate(cfg: Dict, node: Any) -> Any:
    if isinstance(node, dict):
        return {k: _interpolate(cfg, v) for k, v in node.items()}
    if isinstance(node, list):
        return [_interpolate(cfg, v) for v in node]
    if isinstance(node, str):
        def sub(m):
            value = _resolve_path(cfg, m.group(1))
            return str(value)
        full = _INTERP.fullmatch(node)
        if full:
            value = _resolve_path(cfg, full.group(1))
            return _interpolate(cfg, value) if isinstance(value, str) else value
        return _INTERP.sub(sub, node)
    return node


def load_config(config_dir: str, config_name: str,
                overrides: Iterable[str] = ()) -> Config:
    cfg = _compose(config_dir, config_name)
    cfg = apply_overrides(cfg, overrides)
    # fixed-point interpolation (nested ${} references)
    for _ in range(8):
        new = _interpolate(cfg, cfg)
        if new == cfg:
            break
        cfg = new
    return Config.wrap(cfg)


def main_config(config_path: str, config_name: str):
    """Decorator mirroring @hydra.main: parses sys.argv overrides and calls
    fn(cfg). `config_path` is relative to the decorated function's module."""
    import functools
    import inspect
    import sys

    def decorator(fn):
        @functools.wraps(fn)
        def wrapper(argv: Union[List[str], None] = None):
            # every entry point gets the persistent compile cache (runtime
            # jax.config.update — the env-var route is latched too early
            # under the axon sitecustomize, tcnerf/utils/cache.py) and a
            # pid file for bench.py's stale-trainer preflight sweep
            from ..utils.cache import enable_compile_cache
            enable_compile_cache()
            try:
                with open("/tmp/tcnerf_trainer.pid", "w") as f:
                    f.write(f"{os.getpid()} {fn.__module__}")
            except OSError:
                pass
            module_dir = os.path.dirname(os.path.abspath(
                inspect.getfile(fn)))
            config_dir = os.path.join(module_dir, config_path)
            args = list(sys.argv[1:] if argv is None else argv)
            name = config_name
            rest = []
            for a in args:
                if a.startswith("--config-name="):
                    name = a.split("=", 1)[1]
                else:
                    rest.append(a)
            cfg = load_config(config_dir, name, rest)
            return fn(cfg)

        return wrapper

    return decorator
