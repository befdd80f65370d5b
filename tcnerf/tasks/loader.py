"""Plugin loading (reference manipulation_tasks/loader.py:7-31)."""

from __future__ import annotations

import importlib
import os
from typing import Dict, List

from . import factory

# Short names for the built-in plugins so configs can say 'grasp_task' instead
# of the full module path; full module paths also work.
_BUILTIN_PLUGINS = {
    "grasp_task": "tcnerf.tasks.plugins.tasks.grasp_task",
    "simple_task": "tcnerf.tasks.plugins.tasks.simple_task",
    "box_packing_task": "tcnerf.tasks.plugins.tasks.box_packing_task",
    "kitting_task": "tcnerf.tasks.plugins.tasks.kitting_task",
    "suction_grasp": "tcnerf.tasks.plugins.oracles.suction_grasp",
    "insertion": "tcnerf.tasks.plugins.oracles.insertion",
    "pick_and_place": "tcnerf.tasks.plugins.primitives.pick_and_place",
    "objects": "tcnerf.tasks.plugins.objects.base",
    "virtual_scene": "tcnerf.tasks.plugins.scenes.virtual",
}


def import_module(name: str):
    name = _BUILTIN_PLUGINS.get(name, name)
    # accept reference-style module paths transparently
    name = name.replace("manipulation_tasks.plugins", "tcnerf.tasks.plugins")
    return importlib.import_module(name)


def load_plugins(plugins: List[str]) -> None:
    for plugin_file in plugins:
        import_module(plugin_file).register()


def add_available_objects(objects: Dict[str, str], root: str = None) -> None:
    for key, value in objects.items():
        if root is not None:
            value = os.path.join(root, value)
        factory.register_available_object(key, value)
