"""Benchmark: seconds per 6-view x 8-frame 256x512 clip (BASELINE.md north star:
< 10 s on TPU; reference publishes no wall-clock, so vs_baseline is the speedup
against the 10 s/clip target — >1.0 means faster than target).

Measures the full generation step at production geometry: 25-step Euler-EDM
with CFG 5.0 (2x batch through UNet+ControlNet with decomposed 4D attention)
+ VAE decode of all 48 view-frames. Random weights (timing is weight-agnostic).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

# must precede any protobuf import for the xprof trace parser (CLAUDE.md)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

# bf16 peak TFLOP/s per chip for MFU (v5e: 197; fall back to v5e's figure)
_PEAK_TFLOPS = {"v5 lite": 197.0, "v5litepod": 197.0, "v5e": 197.0,
                "v4": 275.0, "v3": 123.0, "v6 lite": 918.0, "v6e": 918.0}


def _peak_tflops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, val in _PEAK_TFLOPS.items():
        if key in kind:
            return val
    return 197.0


def _profile_extras(eng, run, c, uc, t, lh, lw, clip_s):
    """Efficiency fields for the bench artifact (VERDICT r3 #7): MFU,
    device-busy fraction, and the hlo_stats bucket breakdown from
    docs/PERF.md's workflow. Best-effort — any failure degrades to {}."""
    import shutil

    import jax
    import numpy as np

    from panacea_tpu.utils.profiling import hlo_stats_summary

    extra = {}
    # sampler-only wall (decode excluded) — the denominator flops refer to
    key = jax.random.PRNGKey(99)
    samples = eng.sample(c, uc=uc, batch_size=t, shape=(lh, lw, 4), rng=key)
    samples.block_until_ready()
    t0 = time.time()
    samples = eng.sample(c, uc=uc, batch_size=t, shape=(lh, lw, 4), rng=key)
    samples.block_until_ready()
    sampler_s = time.time() - t0
    extra["sampler_s"] = round(sampler_s, 3)

    # analytic FLOPs of the compiled whole-trajectory sampler program.
    # XLA cost_analysis counts a while/scan BODY ONCE (measured: ~96 TF for
    # the 25-step trajectory = one CFG denoiser eval), so scale by the step
    # count; the one-time prologue (hint stem, noise init) is over-counted
    # steps-1 times — a few percent, and it biases MFU DOWN (conservative).
    try:
        fn = eng.get_sample_fn(c, uc, t, (lh, lw, 4))
        cost = fn.lower(eng.params["model"], c, uc, key).compile(
        ).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
        steps = int(getattr(eng.sampler, "num_steps", 25) or 25)
        flops *= steps
        if flops > 0:
            peak = _peak_tflops(jax.devices()[0])
            extra["sampler_tflops"] = round(flops / 1e12, 1)
            extra["tflops_per_s"] = round(flops / 1e12 / sampler_s, 1)
            extra["mfu"] = round(flops / 1e12 / sampler_s / peak, 4)
            extra["peak_tflops"] = peak
    except Exception as e:  # cost_analysis availability varies per backend
        print(f"[bench] cost_analysis skipped: {e}", file=sys.stderr)

    # hlo_stats bucket breakdown of one full clip (sampler + decode)
    trace_dir = "/tmp/bench_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    out = run(99)
    out.block_until_ready()
    traced_wall = time.time() - t0
    jax.profiler.stop_trace()
    summary = hlo_stats_summary(trace_dir)
    print(f"[bench] hlo_stats summary: {summary}", file=sys.stderr)
    if summary and summary.pop("on_device", False):
        extra["device_busy_frac"] = round(
            summary["device_ms"] / 1e3 / traced_wall, 3)
        extra["bucket_ms"] = summary["bucket_ms"]
    shutil.rmtree(trace_dir, ignore_errors=True)
    return extra


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from panacea_tpu.config import load_config
    from panacea_tpu.registry import instantiate_from_config

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = load_config(
        os.path.join(here, "panacea_tpu", "configs", "inference_nuscenes.yaml")
    )
    eng = instantiate_from_config(cfg["model"])

    t = eng.num_frames          # 8
    lh, lw = 32, 384            # latent panorama (6 views x 32x64)
    ih, iw = 256, 3072          # image panorama (6 views x 256x512)
    print(f"[bench] backend={jax.default_backend()} "
          f"devices={len(jax.devices())}", file=sys.stderr)

    t0 = time.time()
    eng.init_params(jax.random.PRNGKey(0), latent_hw=(lh, lw), image_hw=(ih, iw))
    print(f"[bench] init {time.time()-t0:.1f}s", file=sys.stderr)

    # on-TPU correctness of the real (non-interpret) Pallas lowering at a hot
    # shape — the unit tests only exercise interpret mode on CPU (VERDICT r1)
    if jax.default_backend() == "tpu":
        from panacea_tpu.ops.attention import attention_xla
        from panacea_tpu.ops.flash_attention import flash_attention

        ks = jax.random.split(jax.random.PRNGKey(42), 3)
        q = jax.random.normal(ks[0], (8, 2048, 5, 64), jnp.bfloat16)
        k = jax.random.normal(ks[1], (8, 2048, 5, 64), jnp.bfloat16)
        v = jax.random.normal(ks[2], (8, 2048, 5, 64), jnp.bfloat16)
        got = np.asarray(jax.jit(flash_attention)(q, k, v), np.float32)
        want = np.asarray(jax.jit(attention_xla)(q, k, v), np.float32)
        err = float(np.max(np.abs(got - want)))
        assert err < 3e-2, f"flash vs xla on-TPU max err {err}"  # bf16 inputs
        print(f"[bench] flash-vs-xla on-TPU max err {err:.2e} OK",
              file=sys.stderr)

    rng = np.random.RandomState(0)
    batch = {
        "jpg": rng.uniform(-1, 1, (1, t, ih, iw, 3)).astype(np.float32),
        "cond_img": rng.uniform(0, 1, (1, t, ih, iw, 19)).astype(np.float32),
        "final_cond_zero": np.zeros((1, t, ih, iw, 3), dtype=np.float32),
        "txt": ["a driving scene, sunny day"],
    }
    batch_uc = dict(batch)
    batch_uc["txt"] = [""]
    c, uc = eng.conditioner.get_unconditional_conditioning(batch, batch_uc=batch_uc)

    def run(seed):
        samples = eng.sample(
            c, uc=uc, batch_size=t, shape=(lh, lw, 4),
            rng=jax.random.PRNGKey(seed),
        )
        return eng.decode_first_stage(samples)

    t0 = time.time()
    out = run(0)
    out.block_until_ready()
    compile_s = time.time() - t0
    print(f"[bench] warmup(compile) {compile_s:.1f}s", file=sys.stderr)

    times = []
    for i in range(3):
        t0 = time.time()
        out = run(i + 1)
        out.block_until_ready()
        times.append(time.time() - t0)
    clip_s = float(np.median(times))
    print(f"[bench] runs: {[round(x,2) for x in times]}", file=sys.stderr)

    extras = {}
    if not os.environ.get("BENCH_NO_PROFILE"):
        try:
            extras = _profile_extras(eng, run, c, uc, t, lh, lw, clip_s)
        except Exception as e:
            print(f"[bench] profile extras skipped: {e}", file=sys.stderr)
    print(f"[bench] extras: {extras}", file=sys.stderr)

    # Multi-chip single-clip latency (the BASELINE.md <10 s north star is a
    # v5e-8 figure): when the driver gives us >1 TPU chip, shard ONE clip
    # over the slice — frames over 't', panorama width over 'view' (ring
    # cross-view attention) — and report that latency as the headline. The
    # current axon tunnel exposes one chip, so this branch is exercised
    # today only by dryrun_multichip's CPU-mesh equivalent.
    n_dev = len(jax.devices())
    view = None
    if n_dev >= 2 and jax.default_backend() == "tpu":
        view = next((v for v in (2, 3, 1) if n_dev % v == 0
                     and t % (n_dev // v) == 0), None)
        if view is None:  # no (t,view) factorization (e.g. 5 or 7 chips)
            print(f"[bench] no (t,view) mesh for {n_dev} devices; "
                  f"reporting single-chip", file=sys.stderr)
    if view is not None:
        from panacea_tpu.parallel.mesh import make_mesh

        eng.set_mesh(make_mesh(n_dev, dp=1, view=view))
        try:
            out = run(0)
            out.block_until_ready()  # sharded compile
            mtimes = []
            for i in range(3):
                t0 = time.time()
                out = run(i + 1)
                out.block_until_ready()
                mtimes.append(time.time() - t0)
        finally:
            eng.set_mesh(None)
        mclip_s = float(np.median(mtimes))
        print(f"[bench] sharded (t={n_dev//view},view={view}) runs: "
              f"{[round(x,2) for x in mtimes]}", file=sys.stderr)
        # the profiling extras above were measured on the UNSHARDED
        # single-chip program — publish them under a singlechip_ prefix so
        # the sharded headline value and the efficiency fields can't be
        # read as describing the same program
        print(json.dumps({
            "metric": f"seconds per 6-view x 8-frame 256x512 clip, ONE clip "
                      f"sharded over {n_dev} TPU chips "
                      f"(t={n_dev//view} x view={view} mesh, ring cross-view "
                      f"attention; 25-step Euler-EDM, CFG 5.0, incl. VAE "
                      f"decode; single-chip: {clip_s:.2f} s); vs_baseline = "
                      f"10s-v5e-8 target / value",
            "value": round(mclip_s, 3),
            "unit": "s/clip",
            "vs_baseline": round(10.0 / mclip_s, 3),
            "singlechip_s": round(clip_s, 3),
            **{f"singlechip_{k}": v for k, v in extras.items()},
        }))
        return

    # The 10 s/clip north star is for a v5e-8 (BASELINE.md); the reference's
    # own deployment is pure data parallelism (one clip per device,
    # SURVEY.md §2.4), so the 8-chip amortized rate is value/8 s/clip.
    print(json.dumps({
        "metric": "seconds per 6-view x 8-frame 256x512 clip on ONE v5e chip "
                  "(25-step Euler-EDM, CFG 5.0, incl. VAE decode); "
                  "vs_baseline = 10s-v5e-8 target / (value/8) under the "
                  "reference's own clip-data-parallel deployment",
        "value": round(clip_s, 3),
        "unit": "s/clip/chip",
        "vs_baseline": round(10.0 / (clip_s / 8.0), 3),
        **extras,
    }))


if __name__ == "__main__":
    main()
