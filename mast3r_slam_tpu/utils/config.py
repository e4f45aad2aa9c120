"""YAML config system with ``inherit:`` chains and deep merging.

Capability parity with the reference config loader (reference:
mast3r_slam/config.py:1-54): a process-global config dict, ``load_config`` that
resolves a recursive ``inherit`` chain relative to the child file, a YAML loader
that parses scientific-notation floats (``1e-3``) as floats, and deep merge where
child keys override parents.
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any

import yaml

# Process-global configuration. Components read lazily at call time so tests can
# swap configs; jitted code must capture values as static Python scalars instead.
config: dict[str, Any] = {}

_FLOAT_RE = re.compile(
    r"""^(?:
        [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
       |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
       |\.[0-9_]+(?:[eE][-+][0-9]+)?
       |[-+]?\.(?:inf|Inf|INF)
       |\.(?:nan|NaN|NAN)
    )$""",
    re.X,
)


class _SciFloatLoader(yaml.SafeLoader):
    """SafeLoader that treats ``1e-3`` style literals as floats (PyYAML 1.1 quirk)."""


_SciFloatLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    _FLOAT_RE,
    list("-+0123456789."),
)


def merge_config(base: dict, child: dict) -> dict:
    """Deep-merge ``child`` into ``base`` (child wins); returns a new dict."""
    out = copy.deepcopy(base)
    for k, v in child.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_config(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def read_yaml(path: str) -> dict:
    with open(path, "r") as f:
        data = yaml.load(f, Loader=_SciFloatLoader)
    return data or {}


def resolve_config(path: str) -> dict:
    """Load a YAML file, recursively resolving its ``inherit`` chain.

    ``inherit`` paths are interpreted relative to the current working directory
    first, then relative to the inheriting file's directory.
    """
    cfg = read_yaml(path)
    parent = cfg.pop("inherit", None)
    if parent is None:
        return cfg
    if not os.path.exists(parent):
        candidate = os.path.join(os.path.dirname(path), os.path.basename(parent))
        if os.path.exists(candidate):
            parent = candidate
        else:
            candidate = os.path.join(os.path.dirname(path), parent)
            if os.path.exists(candidate):
                parent = candidate
    base = resolve_config(parent)
    return merge_config(base, cfg)


def load_config(path: str) -> dict:
    """Resolve ``path`` (with inheritance) into the process-global config."""
    cfg = resolve_config(path)
    set_global_config(cfg)
    return cfg


def set_global_config(cfg: dict) -> None:
    """Replace the contents of the global config in place (preserves identity)."""
    config.clear()
    config.update(cfg)


def get_config() -> dict:
    return config
