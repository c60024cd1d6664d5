"""YAML config system with ``!include``, per-user overlays, and dotted-key flattening.

Behavioural parity with the reference config stack
(`/root/reference/healnet/utils/config.py:12-119`):

- ``Config(path).read()`` returns an attribute-accessible mapping (:class:`Box`).
- A custom ``!include other.yml`` constructor splices sub-configs relative to the
  including file.
- If ``config.$USER.yml`` exists next to ``config.yml`` it recursively overrides it.
- :func:`flatten_config` flattens nested mappings to dotted keys
  (``{"a": {"b": 1}} -> {"a.b": 1}``) so sweep parameters can overwrite leaves.
"""

from __future__ import annotations

import getpass
import os
from typing import Optional

import yaml

from healnet_tpu.utils.boxdict import Box


class CustomYamlLoader(yaml.FullLoader):
    """YAML loader adding an ``!include`` constructor (reference `config.py:12-39`)."""

    def __init__(self, stream):
        self._root = os.path.split(getattr(stream, "name", ""))[0]
        super().__init__(stream)

    def include(self, node: yaml.nodes.ScalarNode) -> Box:
        filename = os.path.join(self._root, self.construct_scalar(node))
        subconfig = _read(filename, loader=CustomYamlLoader)
        return _overwrite_with_user_specific_file(subconfig, filename=filename)


CustomYamlLoader.add_constructor("!include", CustomYamlLoader.include)


class Config:
    def __init__(self, config_path: str):
        self._config_path = config_path

    def read(self) -> Box:
        """Read the main config file, applying any per-user overlay."""
        if os.path.isfile(self._config_path) and os.access(self._config_path, os.R_OK):
            config = _read(filename=self._config_path, loader=CustomYamlLoader)
            return _overwrite_with_user_specific_file(config, filename=self._config_path)
        raise FileNotFoundError(self._config_path)


def _user_specific_file(filename: str) -> Optional[str]:
    """``config.yml`` -> ``config.$USER.yml`` if that file exists, else None."""
    username = getpass.getuser().lower().replace(" ", "_")
    filepath, file_extension = os.path.splitext(filename)
    user_filename = filepath + "." + username + file_extension
    if os.path.isfile(user_filename) and os.access(user_filename, os.R_OK):
        return user_filename
    return None


def _read(filename: str, loader) -> Box:
    if os.path.isfile(filename) and os.access(filename, os.R_OK):
        with open(filename, "r") as f:
            config_dict = yaml.load(f, Loader=loader)
        return Box(config_dict or {})
    raise FileNotFoundError(filename)


def _overwrite_with_user_specific_file(config: Box, filename: str) -> Box:
    user_filename = _user_specific_file(filename)
    if user_filename:
        user_config = _read(user_filename, loader=CustomYamlLoader)
        config.merge_update(user_config)
    return config


def flatten_config(dictionary, parent_key: str = "", sep: str = ".") -> Box:
    """Flatten nested mappings to dotted keys (reference `config.py:98-119`)."""
    flattened = {}
    for key, value in dictionary.items():
        new_key = f"{parent_key}{sep}{key}" if parent_key else key
        if isinstance(value, dict):
            flattened.update(flatten_config(value, parent_key=new_key, sep=sep))
        else:
            flattened[new_key] = value
    return Box(flattened)


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
