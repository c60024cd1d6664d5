"""YAML config system with ``!include``, per-user overlays, and dotted-key flattening.

Behavioural parity with the reference config stack
(`/root/reference/healnet/utils/config.py:12-119`) — the *observable semantics*
match exactly (``!include`` splicing, ``config.$USER.yml`` overlay, dotted
flatten so sweep parameters can overwrite leaves); the implementation and
naming are this package's own:

- ``Config(path).read()`` returns an attribute-accessible mapping (:class:`Box`).
- A custom ``!include other.yml`` constructor splices sub-configs relative to the
  including file.
- If ``config.$USER.yml`` exists next to ``config.yml`` it recursively overrides it.
- :func:`flatten_config` flattens nested mappings to dotted keys
  (``{"a": {"b": 1}} -> {"a.b": 1}``).
"""

from __future__ import annotations

import getpass
import os
from typing import Optional

import yaml

from healnet_tpu.utils.boxdict import Box


class IncludeLoader(yaml.FullLoader):
    """YAML loader with an ``!include`` constructor.

    Included paths resolve relative to the including file; each included file
    gets its own per-user overlay applied before splicing (same layering the
    reference implements, `config.py:12-39`).
    """

    def __init__(self, stream):
        self._include_root = os.path.split(getattr(stream, "name", ""))[0]
        super().__init__(stream)

    def _construct_include(self, node: yaml.nodes.ScalarNode) -> Box:
        target = os.path.join(self._include_root, self.construct_scalar(node))
        return _apply_user_overlay(_load_yaml(target), filename=target)


IncludeLoader.add_constructor("!include", IncludeLoader._construct_include)


class Config:
    def __init__(self, config_path: str):
        self._config_path = config_path

    def read(self) -> Box:
        """Read the main config file, applying any per-user overlay."""
        if not _readable(self._config_path):
            raise FileNotFoundError(self._config_path)
        return _apply_user_overlay(
            _load_yaml(self._config_path), filename=self._config_path
        )


def _readable(path: str) -> bool:
    return os.path.isfile(path) and os.access(path, os.R_OK)


def _user_overlay_path(filename: str) -> Optional[str]:
    """``config.yml`` -> ``config.$USER.yml`` if that file exists, else None."""
    user = getpass.getuser().lower().replace(" ", "_")
    stem, ext = os.path.splitext(filename)
    candidate = f"{stem}.{user}{ext}"
    return candidate if _readable(candidate) else None


def _load_yaml(filename: str) -> Box:
    if not _readable(filename):
        raise FileNotFoundError(filename)
    with open(filename, "r") as f:
        return Box(yaml.load(f, Loader=IncludeLoader) or {})


def _apply_user_overlay(config: Box, filename: str) -> Box:
    overlay = _user_overlay_path(filename)
    if overlay is not None:
        config.merge_update(_load_yaml(overlay))
    return config


def flatten_config(dictionary, parent_key: str = "", sep: str = ".") -> Box:
    """Flatten nested mappings to dotted keys (reference semantics, `config.py:98-119`)."""
    items = []
    for key, value in dictionary.items():
        dotted = sep.join((parent_key, str(key))) if parent_key else str(key)
        if isinstance(value, dict):
            items.extend(flatten_config(value, parent_key=dotted, sep=sep).items())
        else:
            items.append((dotted, value))
    return Box(dict(items))


def unflatten_config(dictionary, sep: str = ".") -> Box:
    """Inverse of :func:`flatten_config` (rebuild keeps nested structure)."""
    out: Box = Box()
    for key, value in dictionary.items():
        parts = key.split(sep)
        node = out
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], dict):
                node[part] = Box()
            node = node[part]
        node[parts[-1]] = value
    return out
