"""Headline benchmark: align + sigma-clip stack + auto-STF stretch.

Workload (BASELINE.json): 16 synthetic JWST-NIRCam-like frames at
5655×2206 float32, shifted star fields with noise. One fused XLA
program: phase-correlation alignment to frame 0 (coarse-to-fine,
matmul FFT), one-pass Pallas shift+clip (5 iterations), robust stats
(compare-count median/MAD), auto-STF, u8 stretch. The stack is
pre-padded to the kernel's aligned layout at ingest (free host-side),
so the Pallas kernel reads HBM exactly once per run.

Baseline: the reference stacks 10×64 MB (167.8 Mpx) with 5 clip
iterations in 2.1 s on a Ryzen 9 7950X → 79.9 Mpx/s
(docs/code/astroburst_technical_document.tex:613). vs_baseline is
this pipeline's Mpx/s per chip over that number.

Secondary metrics in the same JSON line:
- stf_device_ms: device-side STF apply + u8 quantize + 2048² NN
  downsample latency on a 4096² plane (the GpuRenderer slider path),
  measured with K chained dispatches and ONE scalar fetch so the axon
  tunnel's ~31 ms host-fetch floor is excluded. Reference WebGPU
  comparable: 8 ms (tex:618).
- ipc_encode_ms: the 16-byte-header binary preview encode
  (ops/ipc.py) on the host from the fetched downsample.
- fetch_floor_ms: measured single-scalar fetch RTT through the axon
  tunnel (environment, not chip; production hosts fetch over PCIe).
- ingest_decode_gb_s: host-side FITS decode throughput (C++ OpenMP
  byteswap path) for a 10×64 MB batch via io/prefetch.py. H2D is
  excluded: the tunnel moves ~0.03 GB/s, a lab artifact (production
  PCIe is ~10+ GB/s); decode is what the framework owns.

Prints exactly one JSON line.
"""

import json
import os
import struct
import sys
import tempfile
import time

import numpy as np

N_FRAMES = 16
H, W = 5655, 2206
BASELINE_MPX_S = 167.8 / 2.1  # 79.9 Mpx/s
# per-process salt: the axon result cache is server-side and survives
# process death — deterministic (input, i·1e-6) pairs would replay
_SALT = (os.getpid() % 1000) * 1e-5

def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_frames(n, h, w, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.normal(120.0, 6.0, (h, w)).astype(np.float32)
    ys = rng.random(300) * (h - 40) + 20
    xs = rng.random(300) * (w - 40) + 20
    amps = 300.0 + rng.random(300) * 2000.0
    yy = np.arange(h, dtype=np.float32)[:, None]
    xx = np.arange(w, dtype=np.float32)[None, :]
    for sy, sx, amp in zip(ys, xs, amps):
        y0, y1 = max(int(sy) - 8, 0), min(int(sy) + 8, h)
        x0, x1 = max(int(sx) - 8, 0), min(int(sx) + 8, w)
        base[y0:y1, x0:x1] += (
            amp * np.exp(-((yy[y0:y1] - sy) ** 2 + (xx[:, x0:x1] - sx) ** 2)
                         / 5.0)).astype(np.float32)
    frames = []
    shifts = rng.integers(-12, 12, size=(n, 2))
    shifts[0] = 0
    for i in range(n):
        f = np.roll(base, tuple(shifts[i]), axis=(0, 1))
        f = f + rng.normal(0, 2.0, (h, w)).astype(np.float32)
        frames.append(f.astype(np.float32))
    return np.stack(frames)


def bench_ingest_decode():
    """Host decode (GB/s, cores): 10×64 MB BITPIX=-32 frames through
    the dispatcher + native byteswap, pipelined by io/prefetch.py.

    Thread depth matches the available cores — on a 1-core box extra
    worker threads only thrash (r02 recorded 1.06 GB/s with depth=4
    on 1 core; depth=1 measures ~3 GB/s on the same box). The core
    count is recorded alongside so the number is interpretable
    (reference comparable: 1.4 GB/s on 16 Rayon cores, tex:610)."""
    from astroburst_tpu.io.fits_writer import write_fits_mono
    from astroburst_tpu.io.prefetch import prefetch_images

    cores = os.cpu_count() or 1
    depth = max(1, min(4, cores))
    d = tempfile.mkdtemp(prefix="bench_ingest_")
    rng = np.random.default_rng(7)
    plane = rng.normal(100.0, 8.0, (4096, 4096)).astype(np.float32)
    paths = []
    for i in range(10):
        p = os.path.join(d, f"f{i:02d}.fits")
        write_fits_mono(p, plane, bitpix=-32)
        paths.append(p)
    total_gb = 10 * plane.nbytes / 1e9
    # warm the page cache + the thread pool + the native lib once
    for img in prefetch_images(paths[:2], depth=depth, to_device=False):
        pass
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        n = 0
        for img in prefetch_images(paths, depth=depth, to_device=False):
            n += img.image.shape[0]
        best = min(best, time.perf_counter() - t0)
    for p in paths:
        os.unlink(p)
    os.rmdir(d)
    return total_gb / best, cores


def _probe_backend(wait_budget_s: float | None = None) -> bool:
    """Backend init HANGS (never errors) when the axon tunnel is down.
    Probe in SUBPROCESSES (a hung init poisons its process — never this
    one) and retry for up to ASTROBURST_BENCH_WAIT_S seconds (default
    900) so a brief tunnel flap at bench time doesn't cost the round's
    artifact; only then emit the diagnosable JSON error line."""
    import subprocess
    if wait_budget_s is None:
        wait_budget_s = float(os.environ.get("ASTROBURST_BENCH_WAIT_S",
                                             "900"))
    code = ("import jax.numpy as jnp; "
            "jnp.ones((8, 128)).block_until_ready()")
    deadline = time.monotonic() + wait_budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", code], timeout=90,
                               capture_output=True)
            if r.returncode == 0:
                return True
            log(f"backend probe attempt {attempt} rc={r.returncode}: "
                f"{r.stderr.decode(errors='replace')[-200:]}")
        except subprocess.TimeoutExpired:
            log(f"backend probe attempt {attempt} hung (tunnel down?)")
        if time.monotonic() >= deadline:
            return False
        time.sleep(min(60.0, max(1.0, deadline - time.monotonic())))


def main():
    if not _probe_backend():
        print(json.dumps({
            "metric": "align+stack+stretch megapixels/sec/chip",
            "value": 0, "unit": "Mpx/s", "vs_baseline": 0,
            "error": "TPU backend unreachable (axon tunnel down?)"}))
        sys.exit(1)

    import jax
    import jax.numpy as jnp

    from astroburst_tpu.parallel.pipeline import align_stack_stretch
    from astroburst_tpu.stacking.onepass_kernel import pad_stack_aligned

    log(f"devices: {jax.devices()}")
    log("generating frames…")
    frames = make_frames(N_FRAMES, H, W)
    stack = pad_stack_aligned(jnp.asarray(frames))
    jax.block_until_ready(stack)
    log(f"padded stack: {stack.shape}")

    # eps defeats the axon result cache by being a DISTINCT input per
    # dispatch, but flows only into the returned dict — adding it to
    # the stack itself (`s + eps`) materialized a full 1.9 GB copy
    # inside the measured pipeline (~2-3 ms/run of pure
    # anti-caching instrumentation)
    def run_once(s, eps):
        out = align_stack_stretch(s, sigma_low=3.0, sigma_high=3.0,
                                  max_iter=5, align=True,
                                  true_shape=(H, W))
        # checksum INSIDE the program: one dispatch per run instead of
        # pipeline + a separate checksum jit (each axon dispatch costs
        # ~3 ms of host issue; the r5 prefix profile measured the
        # folded form) — eps flows only into the checksum, never the
        # pipeline inputs (a `s + eps` copy cost ~2-3 ms/run in r3)
        cs = (out["stf"][0] + eps + out["rejected"].astype(jnp.float32)
              + out["preview"][0, 0].astype(jnp.float32))
        return cs, out

    fn = jax.jit(run_once)

    log("compiling…")
    t0 = time.perf_counter()
    _cs0, out = fn(stack, jnp.float32(0.0))
    _ = float(_cs0)
    log(f"first call (compile+run): {time.perf_counter() - t0:.1f}s")
    log(f"offsets: {np.asarray(out['offsets'])[:4].tolist()}")
    log(f"rejected: {int(out['rejected'])}, stf: {np.asarray(out['stf'])}")

    # sustained throughput: pipeline K dispatches (distinct inputs so no
    # result caching), reduce all checksums ON DEVICE and fetch ONE
    # scalar — each host fetch through the axon tunnel costs a full
    # ~31 ms RTT and fetches serialize, so per-run fetches would
    # measure the tunnel, not the chip. A production ingest loop syncs
    # once per batch exactly like this.
    reduce_all = jax.jit(lambda *xs: sum(xs))

    # K=16 amortizes the ~29 ms single-fetch RTT to ~1.8 ms/run (a
    # production ingest loop syncs once per batch exactly like this);
    # 5 trials because the best-of on the shared 1-core box needs the
    # extra samples — the r5 3-trial run spread 45/24/28 ms
    K = 16
    times = []
    for trial in range(5):
        t0 = time.perf_counter()
        cs = [fn(stack, jnp.float32(_SALT + (trial * K + i + 1) * 1e-6))[0]
              for i in range(K)]
        _ = float(reduce_all(*cs))
        times.append((time.perf_counter() - t0) / K)
    log(f"per-run times: {[f'{t*1e3:.0f}ms' for t in times]}")

    best = min(times)
    mpx = N_FRAMES * H * W / 1e6
    mpx_s = mpx / best

    # --- stage split (VERDICT r3 #1): each pipeline stage K-batched on
    # its real inputs, checksums reduced on device, one fetch. refine is
    # derived (align − coarse): the two run inside one fused program and
    # share the coarse surface. Overheads (launch + salt add) are NOT
    # subtracted, so the parts can sum past the fused total.
    from astroburst_tpu.alignment.coarse_kernel import (
        coarse_downsample_stack)
    from astroburst_tpu.alignment.phase_correlation import (
        COARSE_MAX_DIM, phase_correlate_stack_padded)
    from astroburst_tpu.imaging.stf import apply_stf_traced, auto_stf_traced
    from astroburst_tpu.ops.stats import stats_core
    from astroburst_tpu.stacking.onepass_kernel import shift_clip_onepass

    offsets_h = jnp.asarray(np.asarray(out["offsets"]))
    dys_h, dxs_h = offsets_h[:, 0], offsets_h[:, 1]
    combined_h = out["combined"]
    jax.block_until_ready((dys_h, dxs_h, combined_h))

    def stage_time(call, K_=8):
        _ = float(call(0))
        bests = 1e9
        for trial in range(2):
            t0 = time.perf_counter()
            cs = [call(trial * K_ + i + 1) for i in range(K_)]
            _ = float(reduce_all(*cs))
            bests = min(bests, (time.perf_counter() - t0) / K_)
        return bests * 1e3

    @jax.jit
    def _align_cs(s, eps):
        # the pipeline's actual align: padded-stack Pallas coarse +
        # folded constant gate + DMA refine crops
        dys, dxs, confs = phase_correlate_stack_padded(s, (H, W))
        return jnp.sum(dys) + jnp.sum(dxs) + jnp.sum(confs) + eps

    @jax.jit
    def _coarse_cs(s, eps):
        ds, by, bx, mn, mx, cnt = coarse_downsample_stack(
            s, (H, W), COARSE_MAX_DIM, with_stats=True)
        return (jnp.sum(ds[0]) + jnp.sum(ds[1:]) * 1e-3 + jnp.sum(mn)
                + jnp.sum(cnt) * 1e-6 + eps)

    @jax.jit
    def _stack_cs(s, dys, dxs, eps):
        c, r = shift_clip_onepass(s, dys, dxs, 3.0, 3.0, 5,
                                  true_shape=(H, W), zero_frames=(0,))
        return c[0, 0] + c[-1, -1] + r.astype(jnp.float32) + eps

    @jax.jit
    def _stats_cs(c, eps):
        mn, mx, _t, count, med, mad = stats_core(c, False)
        sh, mt = auto_stf_traced(mn, mx, med,
                                 jnp.maximum(mad * 1.4826, 1e-30), count)
        u8 = apply_stf_traced(c, mn, mx, sh, mt, as_u8=True)
        return u8[0, 0].astype(jnp.float32) + u8[-1, -1] + eps

    def _e(i):
        return jnp.float32(_SALT + i * 1e-6)

    stage_ms = {}
    stage_ms["align"] = round(stage_time(
        lambda i: _align_cs(stack, _e(i))), 2)
    stage_ms["coarse"] = round(stage_time(
        lambda i: _coarse_cs(stack, _e(i))), 2)
    stage_ms["refine_derived"] = round(
        max(stage_ms["align"] - stage_ms["coarse"], 0.0), 2)
    stage_ms["stack"] = round(stage_time(
        lambda i: _stack_cs(stack, dys_h, dxs_h, _e(i))), 2)
    stage_ms["stats_stf"] = round(stage_time(
        lambda i: _stats_cs(combined_h, _e(i))), 2)
    stage_ms["fused_total"] = round(best * 1e3, 2)
    log(f"stage split: {stage_ms}")

    # fetch floor: single-scalar RTT through the tunnel
    one = jnp.float32(1.0) + out["stf"][0] * 0
    one.block_until_ready()
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(one + 0)
        floors.append(time.perf_counter() - t0)
    fetch_floor = sorted(floors)[2]
    log(f"fetch floor p50: {fetch_floor*1e3:.1f} ms")

    # device-side STF preview: 2048² NN downsample + apply + u8 on a
    # 4096² plane (the slider path), K chained, one fetch. Downsample
    # FIRST, in f32 — pointwise STF commutes with subsampling, and a
    # strided slice of a u8 plane relayouts sub-byte lanes (measured
    # 48 ms vs 4 ms the right way round).
    from astroburst_tpu.imaging.stf import apply_stf_traced
    from astroburst_tpu.ops.ipc import nearest_downsample
    plane = out["combined"][:4096, :2048]
    plane = jnp.pad(plane, ((0, 0), (0, 2048)), mode="reflect")
    plane.block_until_ready()

    @jax.jit
    def render(x, sh, mt):
        small = nearest_downsample(x, 2048)
        u8 = apply_stf_traced(small, jnp.float32(0.0), jnp.float32(4000.0),
                              sh, mt, as_u8=True)
        return u8[0, 0].astype(jnp.float32) + u8[-1, -1]

    _ = float(render(plane, jnp.float32(0.01), jnp.float32(0.3)))
    stf_lat = []
    for trial in range(3):
        t0 = time.perf_counter()
        cs = [render(plane, jnp.float32(0.01 + _SALT + (trial * K + i) * 1e-5),
                     jnp.float32(0.3)) for i in range(K)]
        _ = float(reduce_all(*cs))
        stf_lat.append((time.perf_counter() - t0) / K)
    stf_device_ms = min(stf_lat) * 1e3
    # all three trials recorded: stf_device_ms drifted 2.84 → 5.32 ms
    # between r02 and r03 with no artifact explaining it — trial spread
    # plus the fetch floor make box contention visible in the JSON
    stf_trials = [round(t * 1e3, 2) for t in stf_lat]
    log(f"stf device (4096², K-batched): {stf_device_ms:.2f} ms "
        f"trials={stf_trials}")

    # host-side binary preview framing (ops/ipc.py) on the fetched
    # 2048² downsample: the preview path sends (header, pixel view)
    # scatter-gather — the pixels are a zero-copy reinterpret of the
    # fetched buffer, matching the reference's clean path
    # (infra/ipc.rs:63-73). The one-copy contiguous form is reported
    # alongside for consumers that need a single buffer.
    from astroburst_tpu.ops.ipc import frame_preview_host
    small_host = np.ascontiguousarray(
        np.asarray(nearest_downsample(out["combined"], 2048)), dtype="<f4")
    smn, smx = float(small_host.min()), float(small_host.max())
    t0 = time.perf_counter()
    for _ in range(50):
        hdr, view = frame_preview_host(small_host, smn, smx)
    ipc_encode_ms = (time.perf_counter() - t0) / 50 * 1e3
    t0 = time.perf_counter()
    for _ in range(20):
        buf = bytearray(len(hdr) + len(view))
        buf[:16] = hdr
        buf[16:] = view
    ipc_copy_ms = (time.perf_counter() - t0) / 20 * 1e3
    log(f"ipc frame ({small_host.shape}): {ipc_encode_ms:.4f} ms zero-copy, "
        f"{ipc_copy_ms:.2f} ms one-copy ({len(view) + 16} bytes)")

    # affine warp at 16 Mpx (the compose channel-align hot op);
    # reference budget: the whole affine align runs 0.8 s on CPU
    import math

    from astroburst_tpu.alignment.affine import AffineTransform
    from astroburst_tpu.alignment.warp_shear import warp_shear
    th = math.radians(1.0)
    ct, st = math.cos(th), math.sin(th)
    wt = AffineTransform(a=ct, b=-st, tx=2048 - ct * 2048 + st * 2048,
                         c=st, d=ct, ty=2048 - st * 2048 - ct * 2048)
    wplane = jnp.pad(out["combined"][:4096, :2048], ((0, 0), (0, 2048)),
                     mode="reflect")
    wplane.block_until_ready()

    def warp_cs(x, i):
        o = warp_shear(x + jnp.float32(_SALT + i * 1e-6), wt, 4096, 4096)
        return o[2048, 2048] + o[100, 100]
    warp_jit = jax.jit(warp_cs)
    _ = float(warp_jit(wplane, 0))
    wlat = []
    for trial in range(3):
        t0 = time.perf_counter()
        cs = [warp_jit(wplane, trial * K + i + 1) for i in range(K)]
        _ = float(reduce_all(*cs))
        wlat.append((time.perf_counter() - t0) / K)
    warp_ms = min(wlat) * 1e3
    log(f"warp 16 Mpx (1°): {warp_ms:.1f} ms")

    log("ingest decode bench…")
    ingest_gb_s, ingest_cores = bench_ingest_decode()
    log(f"ingest decode: {ingest_gb_s:.2f} GB/s on {ingest_cores} core(s)")

    # per-op table: every published reference row (bench_ops.py);
    # skippable via ASTROBURST_BENCH_HEADLINE_ONLY=1 for quick runs
    ops = {}
    if os.environ.get("ASTROBURST_BENCH_HEADLINE_ONLY", "0") != "1":
        try:
            import bench_ops
            ops = bench_ops.run_all()
        except Exception as e:  # keep the headline JSON on a row failure
            ops = {"error": f"{type(e).__name__}: {e}"}

    # Emission contract (VERDICT r4 #1): the per-op table goes on its own
    # EARLIER stdout line; the compact headline JSON — value, vs_baseline,
    # stage_ms, no ops — is the FINAL stdout line, so the driver's
    # fixed-size tail capture can never truncate the round's primary
    # result no matter how large the ops table grows.
    print(json.dumps({"ops": ops}))
    print(json.dumps({
        "metric": "align+stack+stretch megapixels/sec/chip "
                  f"({N_FRAMES}x{H}x{W} f32, 5 clip iters)",
        "value": round(mpx_s, 1),
        "unit": "Mpx/s",
        "vs_baseline": round(mpx_s / BASELINE_MPX_S, 2),
        "stf_device_ms": round(stf_device_ms, 2),
        "stf_device_ms_trials": stf_trials,
        "stage_ms": stage_ms,
        "ipc_encode_ms": round(ipc_encode_ms, 4),
        "ipc_copy_ms": round(ipc_copy_ms, 2),
        "fetch_floor_ms": round(fetch_floor * 1e3, 1),
        "warp_16mpx_ms": round(warp_ms, 1),
        "ingest_decode_gb_s": round(ingest_gb_s, 2),
        "ingest_cores": ingest_cores,
    }))


if __name__ == "__main__":
    main()
