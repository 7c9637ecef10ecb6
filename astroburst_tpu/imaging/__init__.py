"""Imaging core: pure functions over device float32 planes.

L2-core analog of the reference (reference: src-tauri/src/core/imaging/).
"""
