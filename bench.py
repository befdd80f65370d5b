"""Headline benchmark: fused NeRF render throughput (rays/sec/chip).

Measures the hot path of the reference workload — hierarchical volumetric
rendering at full model scale (64 coarse + 128 fine samples/ray, 6-block
128-wide MLPs, 480x640x256 feature image, reference configs
src/configs/nerf_model/default.yaml) — with features precomputed once, exactly
like the reference's chunked `infer` path (model_v0.py:255-275). The MLP/MXU
path runs in bfloat16; geometry stays f32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is relative to the 20M rays/sec/chip north-star (BASELINE.json) —
the reference publishes no numbers of its own.

Robustness contract (round-3 postmortem: TERM mid-phase printed nothing;
round-4 postmortem: one phase's RESOURCE_EXHAUSTED starved every later
phase because all phases shared one process and one HBM pool):
  * the PARENT process never imports jax — each phase runs in a fresh
    subprocess (`bench.py --phase NAME`), so HBM is fully released between
    phases and one phase's OOM/crash/hang cannot take the others down;
  * the JSON line is emitted EXACTLY once — on completion, on signal, or
    when the internal budget (TCNERF_BENCH_BUDGET_S, see _BUDGET_S below)
    expires — with whatever fields have landed so far (missing ones null)
    and `completed` telling partial from full results; a signal exits
    128+signum so drivers can also tell an interrupted bench by rc;
  * preflight: stale tcnerf trainer/bench processes (found via their pid
    files) are swept and stale chip locks cleared BEFORE the headline, so
    an uncleanly-killed trainer's server-side HBM cannot starve the run;
  * every phase subprocess activates the persistent compile cache via
    tcnerf.utils.cache (runtime jax.config.update — the env-var route is
    latched too early under the axon sitecustomize), so a prewarmed
    .jax_cache makes the whole bench run in minutes.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np  # host-side only; never initializes a device backend

# jax is imported ONLY in phase subprocesses (_child_main binds these
# globals) — the parent must never initialize the TPU client, so the full
# HBM pool belongs to whichever phase child is running.
jax = None
jnp = None

NORTH_STAR = 20e6

# Tuned-knob file: `.bench_knobs.json` maps TCNERF_BENCH_* names to values
# (written by the on-tunnel sweep in tools/tpu_checklist.sh when a sweep
# point beats the committed defaults with zero overflow). Explicit env vars
# always win; a missing or malformed file is ignored.
_KNOBS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_knobs.json")
try:
    with open(_KNOBS_PATH) as _f:
        _KNOBS = {str(k): str(v) for k, v in json.load(_f).items()}
except Exception:
    _KNOBS = {}


def knob(name: str, default: str) -> str:
    return os.environ.get(name, _KNOBS.get(name, default))


CHIP_LOCK = "/tmp/tcnerf_chip_lock"

# ---------------------------------------------------------------- emit-once

_T0 = time.monotonic()
# Budget calibration: cold (empty .jax_cache) wall times measured round 4 —
# headline ~2050 s, train_b8 ~535 s, clip ~231 s, dngf ~398 s; warm (cache
# prewarmed by tools/tpu_checklist.sh, the intended state at round end) each
# phase lands in ~1-3 min. The round-3 failure (rc=124, nothing printed) is
# consistent with a ~3600 s driver timeout; 3300 s leaves margin to emit
# even for a KILL-only driver, and the signal handler covers everything
# beyond it.
_BUDGET_S = float(os.environ.get("TCNERF_BENCH_BUDGET_S", "3300"))

RESULTS = {
    "metric": ("rays/sec/chip (sorted-window fused hierarchical render, "
               "64+128 samples)"),
    "value": None,
    "unit": "rays/s",
    "vs_baseline": None,
    "useful_tflops": None,
    "pct_of_chain_ceiling": None,
    "swg_overflow_chunks": None,
    "clip_images_per_sec": None,
    "train_step_ms_b1": None,
    "train_step_ms_b8": None,
    "train_tflops_b8": None,
    "train_mfu_pct_b8": None,
    "dngf_train_step_ms_b8": None,
    "rays_per_sec_3view": None,
    "rays_per_sec_hashgrid": None,
    "rays_per_sec_sharded_image": None,
    "n_devices": None,
    "completed": False,
    "phase_status": {},
    "preflight": [],
}
_EMITTED = False
_CHILD = None  # the currently-running phase subprocess (parent only)


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T0)


def emit(reason: str):
    """Print the single JSON result line (exactly once, ever)."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    if reason != "done":
        print(f"bench: emitting early ({reason}), "
              f"{time.monotonic() - _T0:.0f}s elapsed", file=sys.stderr)
    print(json.dumps(RESULTS), flush=True)
    try:
        os.remove(CHIP_LOCK)
    except OSError:
        pass


def _kill_child():
    if _CHILD is not None and _CHILD.poll() is None:
        _CHILD.terminate()
        try:
            _CHILD.wait(timeout=10)
        except subprocess.TimeoutExpired:
            _CHILD.kill()


def _signal_handler(signum, frame):
    _kill_child()
    emit(f"signal {signum}")
    # nonzero exit: a driver checking rc must not record an interrupted
    # bench as a clean success (the `completed` field says the same)
    os._exit(128 + signum)


# -------------------------------------------------------------------- phases


def bench_render():
    """Headline: sorted-window fused hierarchical render (rays/s/chip)."""
    from tcnerf.models.renderer import MVNeRFRenderer

    h, w = 480, 640
    n_views = 1
    n_rays = int(os.environ.get("TCNERF_BENCH_RAYS", "8192"))
    model = MVNeRFRenderer(
        n_views=n_views, n_samples=64, n_features=256, near=0.3, far=1.3,
        original_image_size=(h, w), fusion="without", n_blocks=6,
        hidden_size=128, pallas_mlp=True, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # source and target cameras on a ring looking at the workspace center —
    # rays go through REAL target pixels so their sample points project
    # into the source view like the reference's render workload
    # (model_v0.py:243-281). Random ray directions are degenerate: ~94%
    # never hit the source image and every key clamps to the border.
    from tcnerf.core.rays import get_specific_rays
    from tcnerf.data.synthetic import camera_ring
    cfg, tgt = camera_ring(2, height=h, width=w)[:2]
    k4 = np.eye(4, dtype=np.float32)
    k4[:3, :3] = cfg["intrinsics"].reshape(3, 3)
    ext_inv = np.linalg.inv(cfg["pose"]).astype(np.float32)

    pix_x = rng.uniform(0, w - 1, n_rays).astype(np.float32)
    pix_y = rng.uniform(0, h - 1, n_rays).astype(np.float32)
    ro, rd = get_specific_rays(pix_x, pix_y, tgt["pose"],
                               tgt["intrinsics"].reshape(3, 3))
    ray_o = ro[None].astype(np.float32)
    ray_d = rd[None].astype(np.float32)
    src_images = rng.uniform(size=(1, n_views, h, w, 3)).astype(np.float32)
    src_intr = np.broadcast_to(k4, (1, n_views, 4, 4)).copy()
    src_ext = np.broadcast_to(ext_inv, (1, n_views, 4, 4)).copy()
    features = rng.normal(size=(1, n_views, h, w, 256)).astype(np.float32)

    inputs = (jnp.asarray(ray_o), jnp.asarray(ray_d), jnp.asarray(src_images),
              jnp.asarray(src_intr), jnp.asarray(src_ext))
    features = jnp.asarray(features, jnp.bfloat16)
    src_images_b = jnp.asarray(src_images)

    # init only the render-path params (embedding MLPs + readouts) — going
    # through __call__ would also trace/compile the ViT+conv encoder towers,
    # which the feature-precomputed render benchmark never executes.
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        inputs[0], inputs[1], src_images_b, inputs[3], inputs[4], features,
        method="render_rays")

    n_chunks = int(os.environ.get("TCNERF_BENCH_CHUNKS", "8"))
    # rays per dispatch = n_chunks * n_rays (amortizes the host->device
    # dispatch latency of the tunneled chip)
    path = os.environ.get("TCNERF_BENCH_PATH", "swg")

    if path == "swg":
        # sorted-window fused gather+MLP kernel (ops/pallas/swg.py):
        # chunk-invariant prep (pre-projection, transposes, permuted heads)
        # runs ONCE outside the scan
        from tcnerf.models.fused import (derive_window_knobs, swg_prepare,
                                         swg_render_chunk)

        ka_env = knob("TCNERF_BENCH_KA", "4")
        ka_c_env = knob("TCNERF_BENCH_KA_C", "12")
        if ka_env == "auto":
            # adaptive windows: replay the kernel's span math on the REAL
            # bench geometry instead of trusting ring-tuned static knobs
            kn = derive_window_knobs(
                ro, rd, k4, ext_inv, (h, w), n_samples=64, near=0.3, far=1.3,
                bq=int(knob("TCNERF_BENCH_BQ", "1024")),
                sg=int(knob("TCNERF_BENCH_SG", "8")),
                sg_c=int(knob("TCNERF_BENCH_SG_C", "8")),
                patch_cap=int(knob("TCNERF_BENCH_PATCH_CAP", "8192")))
            ka_env, ka_c_env = str(kn["ka"]), str(kn["ka_c"])
            print(f"bench: adaptive windows ka={ka_env} ka_c={ka_c_env} "
                  f"{kn['stats']}", file=sys.stderr)

        # big arrays (the 157 MB bf16 feature image, source images) ride as
        # explicit jit ARGUMENTS: closed-over jnp arrays become jaxpr
        # constants whose VALUES ship with every remote-compile request and
        # bloat the persistent-cache entry (~510 MB measured round 5)
        @jax.jit
        def render_many(params, src_images_b, features, ray_o, ray_d, keys):
            prepared = swg_prepare(params, src_images_b, features,
                                   n_blocks=6, ka=4)

            def chunk(carry, key):
                # tuned round-3 window geometry (docs/perf_notes.md):
                # 8192-ray chunks amortize per-call fixed costs; ka=4 fine
                # windows + msplit=4 independent chain streams with the
                # block-level patch repairing the ~tens of sparse subgroups
                # that overflow 512-row windows; narrow ka_c=6 coarse windows
                # under a large patch capacity (adopted sweep knobs)
                out = swg_render_chunk(
                    prepared, ray_o, ray_d, inputs[3], inputs[4], key,
                    n_samples=64, near=0.3, far=1.3, n_blocks=6,
                    ka=int(ka_env),
                    bq=int(knob("TCNERF_BENCH_BQ", "1024")),
                    sg=int(knob("TCNERF_BENCH_SG", "8")),
                    ka_c=int(ka_c_env),
                    sg_c=int(knob("TCNERF_BENCH_SG_C", "8")),
                    msplit=int(knob("TCNERF_BENCH_MSPLIT", "4")),
                    patch_cap=int(knob("TCNERF_BENCH_PATCH_CAP", "8192")))
                return carry + jnp.sum(out[2].astype(jnp.float32)), out[4]

            acc, n_of = jax.lax.scan(chunk, jnp.zeros(()), keys)
            return acc, jnp.sum(n_of)
    else:
        @jax.jit
        def render_many(params, src_images_b, features, ray_o, ray_d, keys):
            def chunk(carry, key):
                out = model.apply({"params": params}, ray_o, ray_d, src_images_b,
                                  inputs[3], inputs[4], features,
                                  rngs={"sampling": key}, method="render_rays")
                return carry + jnp.sum(out[2].astype(jnp.float32)), None

            acc, _ = jax.lax.scan(chunk, jnp.zeros(()), keys)
            return acc, jnp.zeros((), jnp.int32)

    params = variables["params"]
    keys = jax.random.split(key, n_chunks)
    # warmup/compile (host pull = real sync)
    acc, n_of = render_many(params, src_images_b, features,
                            inputs[0], inputs[1], keys)
    _ = float(acc)
    RESULTS["swg_overflow_chunks"] = int(n_of)

    n_iters = 5
    # NOTE: end timing with a host transfer — block_until_ready does not
    # actually synchronize through the axon tunnel (see docs/perf_notes.md)
    t0 = time.perf_counter()
    for i in range(n_iters):
        out, _nof = render_many(params, src_images_b, features,
                                inputs[0], inputs[1], keys)
    _ = float(out)
    dt = time.perf_counter() - t0

    rays_per_sec = n_iters * n_chunks * n_rays / dt

    # MFU accounting: useful FLOPs = what the reference algorithm requires
    # per sample (model_v0.py:102-184 at default shapes) — full layer_0
    # ((120 enc + 259 feat) x 128), 12 residual layers (128x128), readout
    # (128x4); x2 for MAC. Gather/sort/compositing overheads excluded.
    # 192 = 64 coarse + 128 fine samples per ray. The 74 TF/s denominator is
    # this chip's measured ceiling for K=N=128 matmul chains
    # (docs/perf_notes.md) — the speed-of-light for this chain shape.
    useful_tflops = rays_per_sec * 192 * FLOP_PER_SAMPLE / 1e12

    RESULTS["value"] = round(rays_per_sec, 1)
    RESULTS["vs_baseline"] = round(rays_per_sec / NORTH_STAR, 4)
    RESULTS["useful_tflops"] = round(useful_tflops, 2)
    RESULTS["pct_of_chain_ceiling"] = round(
        100 * useful_tflops / CHAIN_CEILING_TFLOPS, 1)
    if path != "swg":
        RESULTS["metric"] = ("rays/sec/chip (fused hierarchical render, "
                             "64+128 samples)")


# Per-sample MLP-chain forward FLOPs at the reference model shape.
FLOP_PER_SAMPLE = 2 * (379 * 128 + 12 * 128 * 128 + 128 * 4)
CHAIN_CEILING_TFLOPS = 74.0
# VisualFeatures (ViT-B/16 @224^2 + DPT decoder + conv encoder @480x640)
# forward FLOPs per source image — XLA cost_analysis of the jitted forward
# (tools/encoder_flops.py; 235,354,587,136 flops). The training step runs
# this once per source view per step; it DOMINATES train-step FLOPs (the
# 512-ray x 192-sample MLP path is ~48 GFLOP/sample-batch vs 235 GFLOP/image).
ENCODER_FWD_FLOPS = 235.354587e9
# v5e bf16 peak (single chip) — the train-MFU denominator. Serving keeps the
# measured 74 TF/s K=128-chain ceiling as its sharper denominator.
PEAK_TFLOPS = 197.0


def bench_3view(n_rays: int = 4096, n_chunks: int = 8, iters: int = 3):
    """3-view hierarchical render throughput (rays/s) — the reference's
    nerf_3_view serving shape (src/configs/nerf_3_view.yaml), features
    precomputed, corner-gather + fused Pallas MLP chains.

    Measured design note (docs/perf_notes.md round 3): the sorted-window
    kernel does NOT extend profitably to multi-view — each view needs its
    own sort order (spans under a shared order cover the whole image:
    p99 367k keys vs 691 for the owning view), and re-aligning three
    independently-sorted 128-wide streams for the mid-chain mean fusion
    costs full-width row gathers (~12 ns/row) >= the scattered gathers the
    windows would save. The TPU-right 3-view path is therefore the
    pre-projected corner-row gather (one row per query per view) feeding
    VMEM-resident Pallas chains — benched here."""
    from tcnerf.core.rays import get_specific_rays
    from tcnerf.data.synthetic import camera_ring
    from tcnerf.models.renderer import MVNeRFRenderer

    h, w, v = 480, 640, 3
    model = MVNeRFRenderer(
        n_views=v, n_samples=64, n_features=256, near=0.3, far=1.3,
        original_image_size=(h, w), fusion="without", n_blocks=6,
        hidden_size=128, pallas_mlp=True, dtype=jnp.bfloat16)

    rng = np.random.default_rng(4)
    cams = camera_ring(v + 1, height=h, width=w)
    srcs, tgt = cams[:v], cams[v]
    k4s, exts = [], []
    for c in srcs:
        k4 = np.eye(4, dtype=np.float32)
        k4[:3, :3] = c["intrinsics"].reshape(3, 3)
        k4s.append(k4)
        exts.append(np.linalg.inv(c["pose"]).astype(np.float32))
    pix_x = rng.uniform(0, w - 1, n_rays).astype(np.float32)
    pix_y = rng.uniform(0, h - 1, n_rays).astype(np.float32)
    ro, rd = get_specific_rays(pix_x, pix_y, tgt["pose"],
                               tgt["intrinsics"].reshape(3, 3))
    ray_o = jnp.asarray(ro[None].astype(np.float32))
    ray_d = jnp.asarray(rd[None].astype(np.float32))
    src_images = jnp.asarray(rng.uniform(size=(1, v, h, w, 3)), jnp.float32)
    src_intr = jnp.asarray(np.stack(k4s)[None])
    src_ext = jnp.asarray(np.stack(exts)[None])
    features = jnp.asarray(rng.normal(size=(1, v, h, w, 256)), jnp.bfloat16)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        ray_o, ray_d, src_images, src_intr, src_ext, features,
        method="render_rays")
    params = variables["params"]

    # big arrays ride as explicit jit ARGUMENTS: closed-over jnp arrays
    # become jaxpr constants whose VALUES ship with the remote-compile
    # request — the 3-view 471 MB feature tensor exceeds the compile
    # service's request-size limit (HTTP 413)
    @jax.jit
    def render_many(params, src_images, features, keys):
        def chunk(carry, key):
            out = model.apply({"params": params}, ray_o, ray_d, src_images,
                              src_intr, src_ext, features,
                              rngs={"sampling": key}, method="render_rays")
            return carry + jnp.sum(out[2].astype(jnp.float32)), None

        acc, _ = jax.lax.scan(chunk, jnp.zeros(()),
                              jax.random.split(keys, n_chunks))
        return acc

    _ = float(render_many(params, src_images, features, jax.random.PRNGKey(2)))
    t0 = time.perf_counter()
    for i in range(iters):
        out = render_many(params, src_images, features, jax.random.PRNGKey(2))
    _ = float(out)
    dt = time.perf_counter() - t0
    return iters * n_chunks * n_rays / dt


def bench_hashgrid(n_rays: int = 8192, n_chunks: int = 8, iters: int = 5):
    """Hash-grid field render throughput (rays/s) — the beyond-reference
    "fast field" serving config (BASELINE.json config 4): multiresolution
    hash encoding (ops/hashgrid.py) + a small MLP replaces the per-view
    projection/gather + 6-block 128-wide chain. Same hierarchical sampling
    (64+128), same compositing; the reference-MLP path stays the parity
    default."""
    from tcnerf.core.rays import get_specific_rays
    from tcnerf.data.synthetic import camera_ring
    from tcnerf.models.renderer import MVNeRFRenderer

    h, w = 480, 640
    model = MVNeRFRenderer(
        n_views=1, n_samples=64, n_features=256, near=0.3, far=1.3,
        original_image_size=(h, w), fusion="without", n_blocks=6,
        hidden_size=128, field="hashgrid", dtype=jnp.bfloat16)

    rng = np.random.default_rng(5)
    cfg, tgt = camera_ring(2, height=h, width=w)[:2]
    k4 = np.eye(4, dtype=np.float32)
    k4[:3, :3] = cfg["intrinsics"].reshape(3, 3)
    ext_inv = np.linalg.inv(cfg["pose"]).astype(np.float32)
    pix_x = rng.uniform(0, w - 1, n_rays).astype(np.float32)
    pix_y = rng.uniform(0, h - 1, n_rays).astype(np.float32)
    ro, rd = get_specific_rays(pix_x, pix_y, tgt["pose"],
                               tgt["intrinsics"].reshape(3, 3))
    ray_o = jnp.asarray(ro[None].astype(np.float32))
    ray_d = jnp.asarray(rd[None].astype(np.float32))
    src_images = jnp.asarray(rng.uniform(size=(1, 1, h, w, 3)), jnp.float32)
    src_intr = jnp.asarray(np.broadcast_to(k4, (1, 1, 4, 4)).copy())
    src_ext = jnp.asarray(np.broadcast_to(ext_inv, (1, 1, 4, 4)).copy())
    features = jnp.zeros((1, 1, 1, 1, 0), jnp.bfloat16)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        ray_o, ray_d, src_images, src_intr, src_ext, features,
        method="render_rays")
    params = variables["params"]

    @jax.jit
    def render_many(params, keys):
        def chunk(carry, key):
            out = model.apply({"params": params}, ray_o, ray_d, src_images,
                              src_intr, src_ext, features,
                              rngs={"sampling": key}, method="render_rays")
            return carry + jnp.sum(out[2].astype(jnp.float32)), None

        acc, _ = jax.lax.scan(chunk, jnp.zeros(()), keys)
        return acc

    keys = jax.random.split(jax.random.PRNGKey(2), n_chunks)
    _ = float(render_many(params, keys))
    t0 = time.perf_counter()
    for i in range(iters):
        out = render_many(params, keys)
    _ = float(out)
    dt = time.perf_counter() - t0
    return iters * n_chunks * n_rays / dt


def bench_sharded(chunk: int = 4096, iters: int = 3):
    """Sharded full-image serving over ALL visible devices
    (parallel/serve.py render_image_sharded) — the declared scale-out path
    past the single-chip composed floor. On a 1-chip box this measures the
    1-device-mesh image render; on a real slice the same code reports
    deployable multi-chip rays/s (enable with TCNERF_BENCH_SHARDED=1).
    Weak-scaling curve + overhead model: tools/bench_serve_scaling.py."""
    from tcnerf.data.synthetic import camera_ring
    from tcnerf.models.renderer import MVNeRFRenderer
    from tcnerf.parallel.mesh import make_mesh
    from tcnerf.parallel.serve import render_image_sharded

    h, w = 480, 640
    model = MVNeRFRenderer(
        n_views=1, n_samples=64, n_features=256, near=0.3, far=1.3,
        original_image_size=(h, w), fusion="without", n_blocks=6,
        hidden_size=128, pallas_mlp=True, dtype=jnp.bfloat16)
    rng = np.random.default_rng(6)
    cfg, tgt = camera_ring(2, height=h, width=w)[:2]
    k4 = np.eye(4, dtype=np.float32)
    k4[:3, :3] = cfg["intrinsics"].reshape(3, 3)
    ext_inv = np.linalg.inv(cfg["pose"]).astype(np.float32)
    src_images = jnp.asarray(rng.uniform(size=(1, 1, h, w, 3)), jnp.float32)
    src_intr = jnp.asarray(k4, jnp.float32)[None, None]
    src_ext = jnp.asarray(ext_inv, jnp.float32)[None, None]
    feats = jnp.asarray(rng.normal(size=(1, 1, h, w, 256)), jnp.bfloat16)
    ro = jnp.zeros((1, 8, 3), jnp.float32)
    rd = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1, 8, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        ro, rd, src_images, src_intr, src_ext, feats, method="render_rays")
    mesh = make_mesh(len(jax.devices()))

    def render():
        rgb, _ = render_image_sharded(
            mesh, model.apply, variables, src_images, src_intr, src_ext,
            feats, jnp.asarray(tgt["pose"], jnp.float32),
            jnp.asarray(tgt["intrinsics"].reshape(3, 3), jnp.float32),
            jax.random.PRNGKey(9), h, w, chunk=chunk)
        return float(jnp.sum(rgb.astype(jnp.float32)))  # host pull = sync

    render()
    t0 = time.perf_counter()
    for _ in range(iters):
        render()
    dt = (time.perf_counter() - t0) / iters
    return h * w / dt


def bench_train_step(batch: int, iters: int = 3, scan_len: int = 4,
                     n_rays: int = 512):
    """Full fwd+bwd NeRF train step time (ms) at the reference training shape:
    512 rays x 64 coarse (+128 fine) samples, encoder towers IN the loop,
    480x640 sources, fusion='without' (the reference's batch-8 config,
    src/configs/nerf_training/default.yaml + model_without.py). The dominant
    reference workload is 1600 epochs of exactly this step
    (model_v0.py:186-197)."""
    from tcnerf.core.rays import get_specific_rays
    from tcnerf.data.synthetic import camera_ring
    from tcnerf.models import training as T
    from tcnerf.models.renderer import MVNeRFRenderer

    h, w = 480, 640
    # mirror the training entry point's model construction
    # (train_nerf.build_model): remat + scattered gather — full-scale
    # fwd+bwd at batch 8 does not fit HBM without them
    model = MVNeRFRenderer(
        n_views=1, n_samples=64, n_features=256, near=0.3, far=1.3,
        original_image_size=(h, w), fusion="without", n_blocks=6,
        hidden_size=128, corner_gather=False, remat=True,
        pallas_mlp=os.environ.get("TCNERF_BENCH_TRAIN_PALLAS", "0") == "1",
        encoder_dtype=os.environ.get("TCNERF_BENCH_TRAIN_ENCDTYPE") or None)

    rng = np.random.default_rng(2)
    cfg, tgt = camera_ring(2, height=h, width=w)[:2]
    k4 = np.eye(4, dtype=np.float32)
    k4[:3, :3] = cfg["intrinsics"].reshape(3, 3)
    ext_inv = np.linalg.inv(cfg["pose"]).astype(np.float32)
    pix_x = rng.uniform(0, w - 1, (batch, n_rays)).astype(np.float32)
    pix_y = rng.uniform(0, h - 1, (batch, n_rays)).astype(np.float32)
    ro = np.empty((batch, n_rays, 3), np.float32)
    rd = np.empty((batch, n_rays, 3), np.float32)
    for b in range(batch):
        ro[b], rd[b] = get_specific_rays(pix_x[b], pix_y[b], tgt["pose"],
                                         tgt["intrinsics"].reshape(3, 3))
    inputs = (jnp.asarray(ro), jnp.asarray(rd),
              jnp.asarray(rng.uniform(size=(batch, 1, h, w, 3)), jnp.float32),
              jnp.asarray(np.broadcast_to(k4, (batch, 1, 4, 4))),
              jnp.asarray(np.broadcast_to(ext_inv, (batch, 1, 4, 4))))
    labels = jnp.asarray(rng.uniform(size=(batch, n_rays, 3)), jnp.float32)

    state = T.create_train_state(model, jax.random.PRNGKey(0), inputs)

    @jax.jit
    def run(state, inputs, labels, rng):
        def step(st, key):
            st, metrics = T.nerf_train_step(st, inputs, labels, key)
            return st, metrics["loss"]

        return jax.lax.scan(step, state, jax.random.split(rng, scan_len))

    st, losses = run(state, inputs, labels, jax.random.PRNGKey(1))
    _ = float(losses[-1])                                  # warmup + sync
    t0 = time.perf_counter()
    for i in range(iters):
        st, losses = run(st, inputs, labels, jax.random.PRNGKey(2 + i))
    _ = float(losses[-1])
    dt = time.perf_counter() - t0
    return dt / (iters * scan_len) * 1e3


def train_step_useful_tflop(batch: int, n_rays: int = 512,
                            n_views: int = 1) -> float:
    """Useful TFLOP per train step (reference algorithm, not as-executed):
    fwd + bwd = 3x forward (bwd-activations + bwd-weights each cost one
    forward-equivalent). Rematerialization recompute is deliberately NOT
    counted — it is implementation overhead, so MFU reads as honest
    utilization of the algorithmically required work."""
    ray_fwd = batch * n_rays * 192 * FLOP_PER_SAMPLE
    enc_fwd = batch * n_views * ENCODER_FWD_FLOPS
    return 3.0 * (ray_fwd + enc_fwd) / 1e12


def bench_dngf_step(batch: int = 8, iters: int = 3, scan_len: int = 2):
    """Second-order DeltaNGF train step time (ms) at the reference grasp
    shape: batch x (512 landscape poses + 32x6 augmented trajectory poses)
    x 42 probes, encoder in the loop (grasp_training/default.yaml batch 8,
    generator_grasp pose_augmentation_factor=32 x n_future_poses=6,
    delta_ngf/model.py:254-309)."""
    from tcnerf.data.generators import camera_parameters
    from tcnerf.data.synthetic import camera_ring
    from tcnerf.models import grasp_training as GT
    from tcnerf.models.grasp import GraspEBM

    h, w = 480, 640
    n_landscape, n_grad = 512, 32 * 6
    model = GraspEBM(n_views=1, n_features=256, original_image_size=(h, w),
                     n_5d_poses=7, n_blocks=6, hidden_size=128)

    rng = np.random.default_rng(3)
    cfg = camera_ring(1, height=h, width=w)[0]
    ext_inv, k4 = camera_parameters(cfg)
    imgs = jnp.asarray(rng.uniform(size=(batch, 1, h, w, 3)), jnp.float32)
    intr = jnp.asarray(np.broadcast_to(k4, (batch, 1, 4, 4)), jnp.float32)
    ext = jnp.asarray(np.broadcast_to(ext_inv, (batch, 1, 4, 4)), jnp.float32)

    def poses(n):
        t = rng.uniform([0.3, -0.25, 0.0], [0.7, 0.25, 0.3],
                        (batch, n, 3)).astype(np.float32)
        q = rng.normal(size=(batch, n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        return jnp.asarray(t), jnp.asarray(q)

    l_t, l_r = poses(n_landscape)
    g_t, g_r = poses(n_grad)
    onehot = np.zeros((batch, n_landscape), np.float32)
    onehot[:, 0] = 1.0
    labels = [jnp.asarray(onehot),
              jnp.asarray(rng.normal(size=(batch, n_grad, 3)), jnp.float32),
              jnp.asarray(rng.normal(size=(batch, n_grad, 4)), jnp.float32)]
    inputs = [l_t, l_r, g_t, g_r, imgs, intr, ext]

    poses44 = jnp.tile(jnp.eye(4), (batch, 2, 1, 1)).astype(jnp.float32)
    params = model.init(jax.random.PRNGKey(0), poses44, imgs, intr,
                        ext)["params"]
    state = GT.create_grasp_train_state(model, params)

    @jax.jit
    def run(state, inputs, labels):
        def step(st, i):
            st, metrics = GT.delta_ngf_train_step(st, inputs, labels)
            return st, metrics["landscape_loss"]

        return jax.lax.scan(step, state, jnp.arange(scan_len))

    st, losses = run(state, inputs, labels)
    _ = float(losses[-1])
    t0 = time.perf_counter()
    for i in range(iters):
        st, losses = run(st, inputs, labels)
    _ = float(losses[-1])
    dt = time.perf_counter() - t0
    return dt / (iters * scan_len) * 1e3


def bench_clip(batch: int = 32, iters: int = 4):
    """CLIP RN50 visual-tower throughput (images/sec) at 224^2, bf16.

    BASELINE.json's metric line names 'CLIP images/sec' alongside the render
    throughput; the tower is the frozen encoder every CLIP-fused variant runs
    per source view (reference src/lib/clip/model.py:5-8)."""
    from tcnerf.clip.model import CLIPVisualEncoder

    model = CLIPVisualEncoder(dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(size=(batch, 224, 224, 3)),
                       jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)

    # tower params as a jit ARGUMENT, not a closed-over constant — 324 MB
    # of jaxpr constants otherwise ride in every remote-compile request
    @jax.jit
    def run(params, imgs):
        def step(c, _):
            out = model.apply(params, imgs + c.astype(imgs.dtype) * 0)
            return c + out[0].astype(jnp.float32).sum() * 0, None
        acc, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(4))
        return acc

    _ = float(run(params, imgs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(params, imgs)
    _ = float(out)
    dt = (time.perf_counter() - t0) / (iters * 4)
    return batch / dt


# ------------------------------------------------------------------- phases

PHASE_PID = "/tmp/tcnerf_bench_phase.pid"
TRAINER_PID = "/tmp/tcnerf_trainer.pid"


def _run_phase(phase: str) -> dict:
    """Execute one phase (inside the subprocess) → field-update dict."""
    if phase == "render":
        bench_render()
        RESULTS["n_devices"] = len(jax.devices())
        keys = ("metric", "value", "vs_baseline", "useful_tflops",
                "pct_of_chain_ceiling", "swg_overflow_chunks", "n_devices")
        return {k: RESULTS[k] for k in keys}
    if phase == "train_b8":
        ms = round(bench_train_step(batch=8), 2)
        tflop = train_step_useful_tflop(batch=8)
        return {"train_step_ms_b8": ms,
                "train_tflops_b8": round(tflop / (ms / 1e3), 2),
                "train_mfu_pct_b8": round(
                    100 * tflop / (ms / 1e3) / PEAK_TFLOPS, 1)}
    if phase == "train_b1":
        return {"train_step_ms_b1": round(bench_train_step(batch=1), 2)}
    if phase == "clip":
        return {"clip_images_per_sec": round(bench_clip(), 1)}
    if phase == "dngf_b8":
        return {"dngf_train_step_ms_b8": round(bench_dngf_step(batch=8), 2)}
    if phase == "3view":
        return {"rays_per_sec_3view": round(bench_3view(), 1)}
    if phase == "hashgrid":
        return {"rays_per_sec_hashgrid": round(bench_hashgrid(), 1)}
    if phase == "sharded":
        return {"rays_per_sec_sharded_image": round(bench_sharded(), 1)}
    raise ValueError(f"unknown phase {phase!r}")


def _child_main(phase: str, out_path: str):
    """Phase-subprocess entry: own TPU client, own HBM pool, compile cache."""
    try:
        with open(PHASE_PID, "w") as f:
            f.write(f"{os.getpid()} {phase}")
    except OSError:
        pass
    global jax, jnp
    import jax  # noqa: F811 — binds the module-level lazy globals
    import jax.numpy as jnp  # noqa: F811
    from tcnerf.utils.cache import enable_compile_cache
    enable_compile_cache()

    try:
        fields = _run_phase(phase)
    except Exception as e:  # noqa: BLE001
        if "RESOURCE_EXHAUSTED" in repr(e):
            # chip HBM may be held server-side by an uncleanly-dead client;
            # the axon server GCs dead sessions — wait once and retry
            print(f"bench[{phase}]: RESOURCE_EXHAUSTED; retrying in 60 s",
                  file=sys.stderr)
            time.sleep(60)
            fields = _run_phase(phase)
        else:
            raise
    with open(out_path, "w") as f:
        json.dump(fields, f)
    try:
        os.remove(PHASE_PID)
    except OSError:
        pass


# ------------------------------------------------------------------- driver

# (name, gate env var, per-phase COLD wall-time cap in seconds — measured
# round-4 cold times + margin; a warm (.jax_cache prewarmed) phase lands in
# ~1-3 min). Priority order: the headline is the round scoreboard, then
# train/dngf (the VERDICT focus), then the rest.
PHASE_TABLE = [
    ("render", "TCNERF_BENCH_RENDER", 2500),
    ("train_b8", "TCNERF_BENCH_TRAIN", 900),
    ("clip", "TCNERF_BENCH_CLIP", 450),
    ("dngf_b8", "TCNERF_BENCH_TRAIN", 700),
    ("3view", "TCNERF_BENCH_3VIEW", 900),
    ("train_b1", "TCNERF_BENCH_TRAIN", 600),
    ("hashgrid", "TCNERF_BENCH_HASHGRID", 450),
    ("sharded", "TCNERF_BENCH_SHARDED", 450),
]


def _preflight():
    """Sweep stale tcnerf processes/locks so the chip starts free.

    Round-4 postmortem: the driver bench inherited a nearly-full chip after
    the supervisor's trainer was SIGKILLed — every secondary phase died with
    RESOURCE_EXHAUSTED. Trainers and phase children write pid files; anything
    still alive there is ours and stale by definition when a bench starts."""
    notes = RESULTS["preflight"]
    for pidfile in (TRAINER_PID, PHASE_PID):
        try:
            with open(pidfile) as f:
                pid = int(f.read().split()[0])
        except (OSError, ValueError, IndexError):
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode(errors="replace")
        except OSError:
            cmd = ""
        if pid != os.getpid() and ("tcnerf" in cmd or "bench.py" in cmd):
            notes.append(f"killed stale pid {pid} ({os.path.basename(pidfile)})")
            try:
                os.kill(pid, signal.SIGTERM)
                for _ in range(20):
                    time.sleep(1)
                    os.kill(pid, 0)
                os.kill(pid, signal.SIGKILL)
            except OSError:
                pass
        try:
            os.remove(pidfile)
        except OSError:
            pass
    if not notes:
        notes.append("clean")

    # record tunnel/chip liveness so a null-field artifact is attributable:
    # the axon relay has died mid-round twice before (r3, r5 — a trivial op
    # hangs forever); without this note an outage is indistinguishable from
    # a broken bench. The probe is a subprocess (the parent never imports
    # jax) and its ~5 s warm / 180 s cap is charged to the budget up front.
    t0 = time.monotonic()
    try:
        rc = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float(jnp.sum(jnp.arange(8.0))))"],
            timeout=180, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL).returncode
        notes.append(f"tunnel {'ok' if rc == 0 else f'probe rc={rc}'} "
                     f"({time.monotonic() - t0:.0f}s)")
    except subprocess.TimeoutExpired:
        notes.append("tunnel DOWN (trivial-op probe hung 180s)")


def main():
    # cooperative chip lock: long-running background jobs (the convergence
    # supervisor) poll this file and stand down while it is fresh, so a
    # bench invocation — e.g. the round driver's — gets the chip and the
    # remote compile service to itself. Stale (>30 min) locks are ignored
    # by readers; remove any stale one so our own freshness is unambiguous.
    try:
        with open(CHIP_LOCK, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass

    signal.signal(signal.SIGTERM, _signal_handler)
    signal.signal(signal.SIGINT, _signal_handler)

    _preflight()

    global _CHILD
    out_path = f"/tmp/tcnerf_bench_phase_{os.getpid()}.json"
    status = RESULTS["phase_status"]
    last_touch = time.monotonic()
    for name, gate, cold_cap in PHASE_TABLE:
        if gate and os.environ.get(gate, "1") == "0":
            status[name] = "disabled"
            continue
        # leave 60 s to run + emit whatever is left; the per-phase timeout
        # caps a hung/cold phase so it cannot starve the ones after it
        budget = min(_remaining() - 60, cold_cap)
        if budget < 90:
            status[name] = "skipped (budget)"
            print(f"bench: skipping {name} ({_remaining():.0f}s left)",
                  file=sys.stderr)
            continue
        try:
            os.remove(out_path)
        except OSError:
            pass
        t0 = time.monotonic()
        _CHILD = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--phase", name, "--out", out_path])
        rc = None
        while rc is None:
            try:
                rc = _CHILD.wait(timeout=5.0)
            except subprocess.TimeoutExpired:
                if time.monotonic() - t0 > budget:
                    _kill_child()
                    rc = "timeout"
                    break
                if time.monotonic() - last_touch > 600:
                    # keep the cooperative lock FRESH: background trainers
                    # treat a >30-min-old lock as stale and would grab the
                    # chip mid-bench
                    last_touch = time.monotonic()
                    try:
                        os.utime(CHIP_LOCK)
                    except OSError:
                        pass
        _CHILD = None
        dt = time.monotonic() - t0
        if rc == 0 and os.path.exists(out_path):
            try:
                with open(out_path) as f:
                    RESULTS.update(json.load(f))
                status[name] = f"ok ({dt:.0f}s)"
            except (OSError, ValueError) as e:
                status[name] = f"bad output: {e!r}"
        else:
            status[name] = f"rc={rc} ({dt:.0f}s)"
        print(f"bench: {name} -> {status[name]}", file=sys.stderr)
        if _remaining() <= 0:
            emit("internal budget expired")
            os._exit(0)
    try:
        os.remove(out_path)
    except OSError:
        pass
    RESULTS["completed"] = all(
        str(v).startswith(("ok", "disabled")) for v in status.values())
    emit("done")


if __name__ == "__main__":
    if "--phase" in sys.argv:
        import argparse
        p = argparse.ArgumentParser()
        p.add_argument("--phase", required=True)
        p.add_argument("--out", required=True)
        a = p.parse_args()
        _child_main(a.phase, a.out)
    else:
        main()
