"""YAML config with environment-variable interpolation and profiles.

Mirrors the reference's `config::get` on `inst/config.yml` (profiles
default/production/local selected by R_CONFIG_ACTIVE; env interpolation via
`!expr Sys.getenv(...)` — reference `R/utils.R:65-77`, `inst/config.yml:1-75`).

Here: plain YAML; ``${ENV_VAR}`` / ``${ENV_VAR:default}`` placeholders are
interpolated from the process environment; the active profile is selected by
``PIPELINE_CONFIG_ACTIVE`` (falling back to ``default``) and deep-merged over
the ``default`` profile.
"""

from __future__ import annotations

import os
import re
from typing import Any

try:
    import yaml
except ImportError:  # pragma: no cover - pyyaml is normally available
    yaml = None

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\}")


def _interp(value: Any) -> Any:
    if isinstance(value, str):
        def sub(m: re.Match) -> str:
            return os.environ.get(m.group(1), m.group(2) or "")
        return _ENV_RE.sub(sub, value)
    if isinstance(value, dict):
        return {k: _interp(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_interp(v) for v in value]
    return value


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config(path: str, profile: str | None = None) -> dict:
    """Load ``path`` (YAML), interpolate env vars, resolve the profile."""
    if yaml is None:
        raise RuntimeError("pyyaml not available")
    with open(path) as fh:
        raw = yaml.safe_load(fh) or {}
    raw = _interp(raw)
    profile = profile or os.environ.get("PIPELINE_CONFIG_ACTIVE", "default")
    base = raw.get("default", {})
    if profile != "default" and profile in raw:
        return _deep_merge(base, raw[profile])
    return base
