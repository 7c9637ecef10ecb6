"""Wizard state machine (steps/enablement/invalidation/path
resolution) and confidence helpers."""

import numpy as np
import jax.numpy as jnp
import pytest

from astroburst_tpu.analysis.confidence import (compute_detection_snr,
                                                compute_surface_confidence)
from astroburst_tpu.metadata.wizard import (STEP_ORDER, STEPS, WizardState,
                                            initial_state,
                                            invalidate_downstream,
                                            invalidate_from_step,
                                            is_narrowband_workflow,
                                            next_enabled_step,
                                            resolve_any_channel_path,
                                            resolve_channel_path,
                                            resolve_rgb_paths)


def test_step_order_matches_reference():
    assert STEP_ORDER == ["channels", "stack", "align", "crop",
                          "background", "blend", "colorbalance", "mask",
                          "stretch", "adjust", "export"]
    assert len(STEPS) == 11


def test_enablement_rules():
    s = initial_state()
    enabled = {st.id for st in STEPS if st.enabled(s)}
    assert enabled == {"channels", "export"}

    s.bins["ha"] = ["a.fits", "b.fits"]
    enabled = {st.id for st in STEPS if st.enabled(s)}
    assert "stack" in enabled and "mask" in enabled and "stretch" in enabled
    assert "align" not in enabled  # needs 2 filled bins

    s.bins["oiii"] = ["c.fits"]
    enabled = {st.id for st in STEPS if st.enabled(s)}
    assert {"align", "blend", "colorbalance"} <= enabled
    assert "crop" not in enabled  # needs aligned paths
    assert "adjust" not in enabled  # needs composite

    s.aligned_paths = {"ha": "a_al.fits"}
    s.composite_ready = True
    enabled = {st.id for st in STEPS if st.enabled(s)}
    assert {"crop", "adjust"} <= enabled


def test_badges():
    s = initial_state()
    s.bins["ha"] = ["a.fits", "b.fits"]
    s.stacked_paths = {"ha": "st.fits"}
    s.composite_ready = True
    by_id = {st.id: st for st in STEPS}
    assert by_id["channels"].badge(s) == "2"
    assert by_id["stack"].badge(s) == "1"
    assert by_id["blend"].badge(s) == "✓"
    assert by_id["crop"].badge(s) is None


def test_invalidate_from_step():
    done = {k: True for k in STEP_ORDER}
    out = invalidate_from_step(done, "crop")
    assert set(out) == {"channels", "stack", "align"}
    assert invalidate_from_step(done, "nope") == done


def test_invalidate_downstream_clears_artifacts():
    s = initial_state()
    s.bins["ha"] = ["a.fits"]
    s.bins["oiii"] = ["b.fits"]
    s.stacked_paths = {"ha": "s1", "oiii": "s2"}
    s.aligned_paths = {"ha": "a1", "oiii": "a2"}
    s.cropped_paths = {"ha": "c1"}
    s.background_paths = {"ha": "b1"}
    s.composite_ready = True
    s.completed_steps = {k: True for k in STEP_ORDER}

    out = invalidate_downstream(s, "align")
    # align itself is redone: downstream artifacts cleared, align's kept
    assert out.aligned_paths == {"ha": "a1", "oiii": "a2"}
    assert out.cropped_paths == {}
    assert out.background_paths == {}
    assert out.composite_ready is False
    assert out.stacked_paths == s.stacked_paths
    assert "stack" in out.completed_steps
    assert "align" not in out.completed_steps


def test_next_enabled_step():
    s = initial_state()
    assert next_enabled_step(s, "channels") == "export"
    s.bins["ha"] = ["a.fits", "b.fits"]
    assert next_enabled_step(s, "channels") == "stack"
    assert next_enabled_step(s, "export") is None


def test_channel_path_resolution_chain():
    s = initial_state()
    s.bins["ha"] = ["raw.fits"]
    assert resolve_channel_path(s, "ha") == "raw.fits"
    s.stacked_paths["ha"] = "stacked.fits"
    assert resolve_channel_path(s, "ha") == "stacked.fits"
    s.aligned_paths["ha"] = "aligned.fits"
    assert resolve_channel_path(s, "ha") == "aligned.fits"
    s.cropped_paths["ha"] = "cropped.fits"
    assert resolve_channel_path(s, "ha") == "cropped.fits"
    s.background_paths["ha"] = "bg.fits"
    assert resolve_channel_path(s, "ha") == "bg.fits"
    assert resolve_channel_path(s, "oiii") is None
    assert resolve_any_channel_path(s) == "bg.fits"


def test_resolve_rgb_paths_narrowband_fallbacks():
    s = initial_state()
    s.bins["ha"] = ["ha.fits"]
    s.bins["oiii"] = ["o3.fits"]
    out = resolve_rgb_paths(s)
    # HOO-style: Hα→R, OIII→G, OIII reused for B
    assert out["r"] == "ha.fits"
    assert out["g"] == "o3.fits"
    assert out["b"] == "o3.fits"

    s2 = initial_state()
    s2.bins["r"] = ["r.fits"]
    s2.bins["g"] = ["g.fits"]
    s2.bins["b"] = ["b.fits"]
    out2 = resolve_rgb_paths(s2)
    assert (out2["r"], out2["g"], out2["b"]) == ("r.fits", "g.fits",
                                                 "b.fits")


def test_narrowband_detection():
    s = initial_state()
    s.blend_preset = "rgb"
    assert not is_narrowband_workflow(s)
    s.bins["sii"] = ["s.fits"]
    assert is_narrowband_workflow(s)

    s2 = initial_state()  # default preset sho is narrowband
    assert is_narrowband_workflow(s2)

    s3 = initial_state()
    s3.blend_preset = "rgb"
    s3.bins["r"] = ["x.fits"]
    dets = [{"path": "x.fits", "filter": "Hα (656nm)"}]
    assert is_narrowband_workflow(s3, dets)
    assert not is_narrowband_workflow(s3, [{"path": "y.fits",
                                            "filter": "Hα (656nm)"}])


def test_detection_snr():
    assert float(compute_detection_snr(100.0, 10.0)) == pytest.approx(10.0)
    assert float(compute_detection_snr(100.0, 0.0)) == 0.0


def test_surface_confidence(rng):
    surf = rng.normal(5.0, 2.0, 4096).astype(np.float32)
    peak = 25.0
    c = float(compute_surface_confidence(jnp.asarray(surf), peak))
    assert c == pytest.approx((peak - surf.mean()) / surf.std(ddof=1),
                              rel=0.05)
    assert float(compute_surface_confidence(jnp.zeros(16), 1.0)) == 0.0
    assert float(compute_surface_confidence(jnp.zeros(0), 1.0)) == 0.0


def test_auto_map_by_metadata_three_plus():
    from astroburst_tpu.metadata.channel_mapper import (auto_map_by_metadata,
                                                        auto_map_channels)
    files = [{"path": "a.fits", "filter": "F090W"},
             {"path": "b.fits", "filter": "F200W"},
             {"path": "c.fits", "filter": "F444W"}]
    out = auto_map_by_metadata(files)
    assert out["R"]["path"] == "c.fits"   # longest wavelength
    assert out["G"]["path"] == "b.fits"
    assert out["B"]["path"] == "a.fits"   # shortest
    assert auto_map_channels(files) == out


def test_auto_map_two_and_filename_fallback():
    from astroburst_tpu.metadata.channel_mapper import auto_map_channels
    files = [{"path": "x_f115w.fits", "filter": "F115W"},
             {"path": "y_f356w.fits", "filter": "F356W"},
             {"path": "lum_master.fits", "filter": None}]
    out = auto_map_channels(files)
    assert out["R"]["path"] == "y_f356w.fits"
    assert out["B"]["path"] == "x_f115w.fits"
    assert out["L"]["path"] == "lum_master.fits"  # filename "lum"
    assert "G" not in out


def test_auto_map_filename_only():
    from astroburst_tpu.metadata.channel_mapper import auto_map_channels
    files = [{"path": "m31_ha.fits"}, {"path": "m31_oiii.fits"},
             {"path": "m31_sii.fits"}]
    out = auto_map_channels(files)
    assert out["R"]["path"] == "m31_ha.fits"
    assert out["G"]["path"] == "m31_oiii.fits"
    assert out["B"]["path"] == "m31_sii.fits"
