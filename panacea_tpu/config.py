"""YAML config loading with CLI dotlist overrides.

Replaces the reference's OmegaConf usage (inference.py:245-247) with plain
PyYAML (anchors/aliases work natively) plus a small dotlist-merge helper, so
the reference's ``--base cfg.yaml key.sub=value`` CLI surface is preserved.
"""

from __future__ import annotations

import ast
from typing import Any, Dict, List, Sequence

import yaml


def load_config(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def merge_configs(base: Dict[str, Any], *others: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for other in others:
        for k, v in (other or {}).items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = merge_configs(out[k], v)
            else:
                out[k] = v
    return out


def _parse_value(s: str) -> Any:
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s


def apply_dotlist(cfg: Dict[str, Any], dotlist: Sequence[str]) -> Dict[str, Any]:
    """Apply ``key.sub.path=value`` overrides in place (OmegaConf dotlist
    semantics, inference.py:247)."""
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"override {item!r} is not key=value")
        key, val = item.split("=", 1)
        parts = key.split(".")
        node = cfg
        for p in parts[:-1]:
            if isinstance(node, list):
                node = node[int(p)]
            else:
                node = node.setdefault(p, {})
        last = parts[-1]
        if isinstance(node, list):
            node[int(last)] = _parse_value(val)
        else:
            node[last] = _parse_value(val)
    return cfg


def load_configs_with_overrides(paths: List[str], dotlist: Sequence[str] = ()):
    cfgs = [load_config(p) for p in paths]
    cfg = merge_configs(*cfgs) if len(cfgs) > 1 else (cfgs[0] if cfgs else {})
    return apply_dotlist(cfg, dotlist)
