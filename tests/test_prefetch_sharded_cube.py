"""Pipelined ingest loader and sharded cube collapses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from astroburst_tpu.parallel.cube import (shard_cube, sharded_collapse_mean,
                                          sharded_collapse_median)
from astroburst_tpu.parallel.mesh import make_mesh
from tests.test_fits_io import make_fits


def _write(tmp_path, name, data):
    p = tmp_path / name
    p.write_bytes(make_fits(data))
    return str(p)


def test_prefetch_images_order_and_device(tmp_path):
    from astroburst_tpu.io.prefetch import prefetch_images
    paths = [_write(tmp_path, f"f{i}.fits",
                    np.full((8, 8), float(i), np.float32))
             for i in range(5)]
    outs = list(prefetch_images(paths, depth=2))
    assert len(outs) == 5
    for i, img in enumerate(outs):
        assert isinstance(img.image, jax.Array)
        assert float(jnp.mean(img.image)) == pytest.approx(float(i))


def test_prefetch_stack_loader_crops_to_common(tmp_path):
    from astroburst_tpu.io.prefetch import PrefetchingStackLoader
    p1 = _write(tmp_path, "a.fits", np.ones((10, 12), np.float32))
    p2 = _write(tmp_path, "b.fits", np.full((8, 14), 2.0, np.float32))
    stack, headers = PrefetchingStackLoader(depth=2).load_stack([p1, p2])
    assert stack.shape == (2, 8, 12)
    assert len(headers) == 2
    np.testing.assert_allclose(np.asarray(stack[0]), 1.0)
    np.testing.assert_allclose(np.asarray(stack[1]), 2.0)


def test_sharded_cube_mean_matches_eager(rng):
    from astroburst_tpu.cube.eager import collapse_mean
    mesh = make_mesh(axis_names=("frames",))
    n = mesh.shape["frames"]
    cube = rng.normal(10, 3, (4 * n, 16, 24)).astype(np.float32)
    cube[0, 0, 0] = np.nan
    cube[:, 1, 1] = np.nan  # all-invalid pixel
    dev_cube = shard_cube(jnp.asarray(cube), mesh)
    mean_s = np.asarray(sharded_collapse_mean(dev_cube, mesh))
    mean_e = np.asarray(collapse_mean(jnp.asarray(cube)))
    np.testing.assert_allclose(mean_s, mean_e, atol=1e-5)


@pytest.mark.slow
def test_sharded_cube_median_single_rank_convention(rng):
    """The sharded median targets rank ⌈n/2⌉ (the histogram-path
    convention, stats.rs:100), refined to range/16^5."""
    mesh = make_mesh(axis_names=("frames",))
    n_dev = mesh.shape["frames"]
    b = 4 * n_dev
    cube = rng.normal(10, 3, (b, 16, 24)).astype(np.float32)
    cube[:, 1, 1] = np.nan  # all-invalid pixel

    med_s = np.asarray(sharded_collapse_median(
        shard_cube(jnp.asarray(cube), mesh), mesh))

    srt = np.sort(np.nan_to_num(cube, nan=np.inf), axis=0)
    counts = np.isfinite(cube).sum(axis=0)
    ranks = np.ceil(counts * 0.5).astype(int)
    expected = np.take_along_axis(
        srt, np.clip(ranks - 1, 0, b - 1)[None], axis=0)[0]
    expected[counts == 0] = 0.0

    scale = np.nanmax(cube) - np.nanmin(cube)
    mask = counts > 0
    # bracket midpoint is within half a final-bin width of the value
    assert np.abs(med_s - expected)[mask].max() < scale / 16**5 + 1e-5
    assert med_s[1, 1] == 0.0
