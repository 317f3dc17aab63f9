"""Hydra-compatible configuration system (self-contained).

The reference composes configs with hydra 1.0 + OmegaConf (structured configs
registered in a ConfigStore + a YAML tree under ``config/`` + CLI overrides).
Hydra is not available in this environment, so this module re-implements the
subset of semantics the reference's public surface depends on
(cf. reference config/slam.yaml, slam/common/utils.py:199-302):

* a ``ConfigStore`` of (group, name) -> config-node registrations,
* a YAML tree with ``defaults`` lists and ``# @package _group_`` group files,
* CLI overrides: ``group=option``, ``a.b.c=value``, ``+new.key=value``,
* ``${env:VAR}`` / ``${now:%fmt}`` interpolation,
* ``???`` (MISSING) placeholders,
* dataclass hydration tolerating missing fields (ObjectLoaderEnum.load).

Configs are plain nested dicts; components hydrate their ``@dataclass`` nodes
at construction time.
"""
from __future__ import annotations

import dataclasses
import datetime
import os
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Type

import yaml

MISSING = "???"


# ----------------------------------------------------------------------------
# ConfigStore
# ----------------------------------------------------------------------------

class ConfigStore:
    """Maps (group, name) -> default config dict (from a dataclass or dict)."""

    _instance: Optional["ConfigStore"] = None

    def __init__(self):
        self._store: Dict[Tuple[str, str], Dict[str, Any]] = {}

    @classmethod
    def instance(cls) -> "ConfigStore":
        if cls._instance is None:
            cls._instance = ConfigStore()
        return cls._instance

    def store(self, group: str, name: str, node: Any):
        self._store[(group, name)] = to_dict(node)

    def get(self, group: str, name: str) -> Optional[Dict[str, Any]]:
        node = self._store.get((group, name))
        return None if node is None else dict(node)


def to_dict(node: Any) -> Dict[str, Any]:
    """Converts a dataclass (type or instance) or mapping to a plain dict."""
    if isinstance(node, dict):
        return {k: to_dict(v) if isinstance(v, (dict,)) or dataclasses.is_dataclass(v) else v
                for k, v in node.items()}
    if dataclasses.is_dataclass(node) and isinstance(node, type):
        node = instantiate_defaults(node)
    if dataclasses.is_dataclass(node):
        out = {}
        for f in dataclasses.fields(node):
            v = getattr(node, f.name, MISSING)
            if dataclasses.is_dataclass(v) or isinstance(v, dict):
                out[f.name] = to_dict(v)
            else:
                out[f.name] = v
        return out
    raise TypeError(f"Cannot convert {type(node)} to config dict")


def instantiate_defaults(cls: Type) -> Any:
    """Instantiates a config dataclass filling required fields with MISSING."""
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.default is not dataclasses.MISSING:
            continue
        if f.default_factory is not dataclasses.MISSING:  # type: ignore
            continue
        kwargs[f.name] = MISSING
    return cls(**kwargs)


def dataclass_from_dict(cls: Type, data: Optional[Dict[str, Any]], **extra) -> Any:
    """Hydrates a config dataclass from a dict, ignoring unknown keys.

    Unknown keys are kept accessible via the instance's ``extra_args`` dict if
    the dataclass defines one; missing required fields become MISSING.
    """
    data = dict(data or {})
    data.update(extra)
    field_names = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in data.items() if k in field_names}
    obj = instantiate_defaults(cls)
    for k, v in kwargs.items():
        f = next(f for f in dataclasses.fields(cls) if f.name == k)
        # Recursively hydrate nested dataclass fields declared with a
        # dataclass default/type when the value is a plain dict.
        setattr(obj, k, v)
    return obj


# ----------------------------------------------------------------------------
# Interpolation
# ----------------------------------------------------------------------------

_INTERP_RE = re.compile(r"\$\{(env|oc\.env|now):([^}]*)\}")


def _interp_value(value: str) -> str:
    def repl(m):
        kind, arg = m.group(1), m.group(2)
        if kind in ("env", "oc.env"):
            parts = [p.strip() for p in arg.split(",")]
            var = parts[0]
            default = parts[1] if len(parts) > 1 else None
            got = os.environ.get(var, default)
            if got is None:
                raise KeyError(f"Environment variable '{var}' is not set "
                               f"(required by config interpolation)")
            return got
        if kind == "now":
            return datetime.datetime.now().strftime(arg)
        raise KeyError(kind)

    return _INTERP_RE.sub(repl, value)


def resolve_interpolations(node: Any) -> Any:
    if isinstance(node, dict):
        return {k: resolve_interpolations(v) for k, v in node.items()}
    if isinstance(node, list):
        return [resolve_interpolations(v) for v in node]
    if isinstance(node, str) and "${" in node:
        return _interp_value(node)
    return node


# ----------------------------------------------------------------------------
# YAML tree composition
# ----------------------------------------------------------------------------

def _deep_set(cfg: Dict[str, Any], dotted: str, value: Any):
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        nxt = node.get(k)
        if not isinstance(nxt, dict):
            nxt = {}
            node[k] = nxt
        node = nxt
    node[keys[-1]] = value


def _deep_get(cfg: Dict[str, Any], dotted: str, default=None):
    node = cfg
    for k in dotted.split("."):
        if not isinstance(node, dict) or k not in node:
            return default
        node = node[k]
    return node


def _deep_merge(base: Dict[str, Any], overlay: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _parse_scalar(text: str) -> Any:
    """Parses a CLI value using YAML scalar rules.

    YAML 1.1 treats exponent floats without a dot ('2e-4') as strings; fall
    back to numeric parsing so such overrides become numbers.
    """
    try:
        value = yaml.safe_load(text)
    except yaml.YAMLError:
        return text
    if isinstance(value, str):
        try:
            return int(value)
        except ValueError:
            pass
        try:
            return float(value)
        except ValueError:
            pass
    return value


class ConfigLoader:
    """Loads and composes the YAML config tree (mini-hydra)."""

    def __init__(self, config_path: str):
        self.root = Path(config_path)

    def _load_group_option(self, group: str, option: str) -> Dict[str, Any]:
        """Loads a `group=option` node: YAML file first, then ConfigStore."""
        yaml_path = self.root / group / f"{option}.yaml"
        store_node = ConfigStore.instance().get(group, option)
        node: Dict[str, Any] = {}
        if store_node is not None:
            node = store_node
        if yaml_path.exists():
            with open(yaml_path) as f:
                text = f.read()
            loaded = yaml.safe_load(text) or {}
            # '# @package _group_' files place their content at the group path
            # (the only packaging mode the reference uses).
            node = _deep_merge(node, loaded)
        if not node and store_node is None:
            raise FileNotFoundError(
                f"Unknown config option '{option}' for group '{group}' "
                f"(no {yaml_path} and no ConfigStore entry)")
        return node

    def compose(self, config_name: str, overrides: Optional[list] = None) -> Dict[str, Any]:
        """Composes the root config + defaults list + CLI overrides."""
        root_file = self.root / f"{config_name}.yaml"
        with open(root_file) as f:
            raw = yaml.safe_load(f) or {}

        defaults = raw.pop("defaults", [])
        cfg: Dict[str, Any] = {}

        # 1. defaults list (group files land at their group path)
        group_choices: Dict[str, str] = {}
        for entry in defaults:
            if isinstance(entry, str):
                continue  # e.g. `_self_`
            (group, option), = entry.items()
            if group.startswith("hydra/"):
                continue  # output-dir templating handled by the runner
            group_choices[group] = option

        # CLI group overrides replace defaults-list choices
        overrides = list(overrides or [])
        dot_overrides = []
        cli_groups = set()
        for ov in overrides:
            if "=" not in ov:
                raise ValueError(f"Malformed override '{ov}' (expected key=value)")
            key, value = ov.split("=", 1)
            add = key.startswith("+")
            key = key.lstrip("+")
            if "." not in key and (self.root / key.replace(".", "/")).is_dir():
                # group override, e.g. `slam/odometry=icp_odometry`
                group_choices[key] = value
                cli_groups.add(key)
            elif "/" in key:
                group_choices[key] = value
                cli_groups.add(key)
            else:
                dot_overrides.append((key, _parse_scalar(value)))

        # Nested defaults (hydra-style): a group option file may carry its own
        # `defaults` list of subgroup choices (e.g. slam/odometry/ct_icp.yaml
        # selecting its local_map + alignment).  An explicit parent choice
        # overrides the root defaults for those subgroups; CLI subgroup
        # overrides still win.
        worklist = list(group_choices.items())
        loaded_nodes: Dict[str, Dict[str, Any]] = {}
        while worklist:
            group, option = worklist.pop(0)
            node = self._load_group_option(group, str(option))
            nested = []
            if isinstance(node, dict) and "defaults" in node:
                node = dict(node)  # never mutate a ConfigStore-backed node
                nested = node.pop("defaults")
            loaded_nodes[group] = node
            for entry in nested:
                if not isinstance(entry, dict):
                    continue
                (sub, sub_opt), = entry.items()
                full = sub if "/" in sub else f"{group}/{sub}"
                if full in cli_groups:
                    continue
                group_choices[full] = sub_opt
                worklist.append((full, sub_opt))

        for group in group_choices:
            path = group.replace("/", ".")
            node = loaded_nodes[group]
            existing = _deep_get(cfg, path, None)
            if isinstance(existing, dict) and isinstance(node, dict):
                # hydra semantics: a parent option file's INLINE keys for a
                # subgroup (e.g. ct_icp_robust_drive.yaml carrying
                # `local_map: {max_neighbor_dist_start: 3.0}` next to a
                # defaults-list local_map choice) override the subgroup
                # file's values -- the primary content merges after defaults.
                node = _deep_merge(node, existing)
            _deep_set(cfg, path, node)

        # 2. the root file's own content merges on top of group defaults
        cfg = _deep_merge(cfg, raw)

        # 3. dotted overrides
        for key, value in dot_overrides:
            _deep_set(cfg, key, value)

        return resolve_interpolations(cfg)


def compose(config_path: str, config_name: str, overrides: Optional[list] = None):
    return ConfigLoader(config_path).compose(config_name, overrides)


# ----------------------------------------------------------------------------
# Registry (the ObjectLoaderEnum equivalent)
# ----------------------------------------------------------------------------

class Registry:
    """String-discriminated factory: config dict -> (class, config dataclass).

    Equivalent to the reference's ``ObjectLoaderEnum`` (utils.py:266-302):
    the config carries a discriminator field (``type`` / ``algorithm`` /
    ``mode`` / ``filter_name``) selecting the registered implementation.
    """

    def __init__(self, name: str, type_key: str = "type"):
        self.name = name
        self.type_key = type_key
        self._entries: Dict[str, Tuple[type, type]] = {}

    def register(self, key: str, cls: type, config_cls: type):
        self._entries[key] = (cls, config_cls)
        return cls

    def keys(self):
        return list(self._entries)

    def get(self, key: str) -> Tuple[type, type]:
        if key not in self._entries:
            raise KeyError(f"Unknown {self.name} '{key}'. "
                           f"Registered: {sorted(self._entries)}")
        return self._entries[key]

    def load(self, config: Any, **kwargs):
        """Instantiates the implementation selected by the config."""
        if config is None:
            return None
        if dataclasses.is_dataclass(config):
            config = to_dict(config)
        if self.type_key not in config or config[self.type_key] in (None, MISSING):
            raise KeyError(f"Config for {self.name} misses its discriminator "
                           f"field '{self.type_key}': {config}")
        key = config[self.type_key]
        if key == "none":
            return None
        cls, config_cls = self.get(key)
        node = dataclass_from_dict(config_cls, config)
        return cls(node, **kwargs)
