"""Public command surface.

One function per reference IPC command, same names, same response keys
(reference: src-tauri/src/lib.rs:116-177 registers 60 commands across
src-tauri/src/cmd/). Returns plain dicts; binary responses return
bytes. Commands are synchronous — batch/async orchestration is the
caller's concern (the reference's spawn_blocking analog).
"""

from astroburst_tpu.api.io import (process_fits, process_fits_full,
                                   get_raw_pixels_preview)

__all__ = [
    "process_fits", "process_fits_full", "get_raw_pixels_preview",
]
