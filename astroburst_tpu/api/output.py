"""Output-dir commands (reference: src-tauri/src/cmd/output.rs)."""

from __future__ import annotations

from typing import Optional

from astroburst_tpu import constants as C
from astroburst_tpu.runtime import output as out
from astroburst_tpu.runtime.config import load_config


def get_output_dir_info(output_dir: str = "") -> dict:
    """cmd/output.rs:109."""
    directory = out.resolve_output_dir(output_dir)
    return out.output_dir_info(directory)


def cleanup_output_cmd(output_dir: str = "",
                       enforce_lru: Optional[bool] = None) -> dict:
    """cmd/output.rs:122 — full cleanup, or size-capped LRU enforcement."""
    directory = out.resolve_output_dir(output_dir)
    if enforce_lru:
        max_bytes = load_config().output_max_bytes
        return out.enforce_output_lru(directory, max_bytes)
    return out.cleanup_output(directory)
