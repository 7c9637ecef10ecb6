"""Config commands (reference: src-tauri/src/cmd/config.rs)."""

from __future__ import annotations

from typing import Optional

from astroburst_tpu import constants as C
from astroburst_tpu.runtime import config as cfg


def get_config() -> dict:
    """cmd/config.rs:8."""
    return cfg.load_config().to_dict()


def update_config(field: str, value) -> dict:
    """cmd/config.rs:16 — field-level update."""
    return cfg.update_config_field(field, value).to_dict()


def save_api_key(key: str, service: Optional[str] = None) -> dict:
    """cmd/config.rs:24."""
    svc = service or C.DEFAULT_API_KEY_SERVICE
    cfg.save_api_key(svc, key)
    return {C.RES_SAVED: True, C.RES_SERVICE: svc}


def get_api_key(service: Optional[str] = None) -> dict:
    """cmd/config.rs:33."""
    svc = service or C.DEFAULT_API_KEY_SERVICE
    key = cfg.get_api_key(svc)
    return {C.RES_SERVICE: svc, "api_key": key or ""}
