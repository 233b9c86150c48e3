"""Pre-flight gate for the driver deliverables (VERDICT r4 #2).

Run this BEFORE ending a round (and after any change to the bench graph
or its consumers).  It catches, at zero/low execution cost, the two
failure classes that shipped broken driver benches in rounds 3 and 4:

  1. AOT-compile the EXACT headline bench graph (1080p, B=16) via
     jit(...).lower().compile() and assert memory_analysis() fits HBM —
     a Mosaic legalization crash or a 16 GB temp blowup surfaces here
     without executing a single step.
  2. Compile-check __graft_entry__.entry() (the driver's single-chip
     gate).
  3. Execute ONE bench step at the full bench shape and sanity-check
     the output (catches execution-time kernel faults).

Exit 0 = safe to let the driver run `python bench.py`.
Sequence with other TPU work — never run two TPU processes at once.

Usage: python tools/preflight.py [--skip-exec]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/mvtools_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

HBM_BUDGET_BYTES = int(os.environ.get("MVT_PREFLIGHT_HBM",
                                      14 * 1024**3))  # v5e: 16 GB


def gb(n):
    return n / 1024**3


def main():
    skip_exec = "--skip-exec" in sys.argv
    backend = jax.default_backend()
    print(f"# preflight backend={backend} "
          f"devices={[str(d) for d in jax.devices()]}", flush=True)

    import bench

    failures = []

    # --- 1. AOT compile + memory analysis of the exact bench graph ---
    batch = int(os.environ.get("MVT_BENCH_B", 48))  # match bench.py main()
    radius = int(os.environ.get("MVT_BENCH_RADIUS", 1))
    batch_fn, make_clip = bench.build_headline(batch=batch, radius=radius)
    clip = make_clip(batch + 2 * radius)
    t0 = time.perf_counter()
    try:
        lowered = jax.jit(batch_fn).lower(clip)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        peak = None
        if mem is not None:
            # field names vary across jax versions; probe the usual ones
            for attr in ("temp_size_in_bytes",):
                peak = getattr(mem, attr, None)
            args_b = getattr(mem, "argument_size_in_bytes", 0) or 0
            out_b = getattr(mem, "output_size_in_bytes", 0) or 0
            total = (peak or 0) + args_b + out_b
            print(f"# bench graph compiled in "
                  f"{time.perf_counter() - t0:.1f}s: temp "
                  f"{gb(peak or 0):.2f} GB + args {gb(args_b):.2f} GB "
                  f"+ out {gb(out_b):.2f} GB = {gb(total):.2f} GB "
                  f"(budget {gb(HBM_BUDGET_BYTES):.1f} GB)", flush=True)
            if total > HBM_BUDGET_BYTES:
                failures.append(
                    f"bench graph needs {gb(total):.2f} GB HBM "
                    f"> budget {gb(HBM_BUDGET_BYTES):.1f} GB")
        else:
            print("# memory_analysis() unavailable on this backend; "
                  "compile succeeded", flush=True)
    except Exception as e:  # noqa: BLE001 — report and fail
        failures.append(f"bench graph failed to compile: {e!r:.500}")
        compiled = None

    # --- 2. driver entry() compile check ---
    try:
        import __graft_entry__
        fn, example_args = __graft_entry__.entry()
        jax.jit(fn).lower(*example_args).compile()
        print("# __graft_entry__.entry() compiles", flush=True)
    except Exception as e:  # noqa: BLE001
        failures.append(f"__graft_entry__.entry() failed: {e!r:.500}")

    # --- 3. one real bench step at the bench shape ---
    if not skip_exec and compiled is not None and not failures:
        try:
            t0 = time.perf_counter()
            out = compiled(clip)
            out.block_until_ready()
            arr = np.asarray(out[0])
            assert arr.shape == (1080, 1920), arr.shape
            assert arr.any(), "all-zero bench output"
            print(f"# one bench step executed in "
                  f"{time.perf_counter() - t0:.2f}s; output ok",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            failures.append(f"bench step execution failed: {e!r:.500}")

    if failures:
        for f in failures:
            print(f"PREFLIGHT FAIL: {f}", flush=True)
        sys.exit(1)
    print("PREFLIGHT OK", flush=True)


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except Exception:
        # fresh remote TPU compiles sometimes fail at first execution
        # but land in the persistent cache (CLAUDE.md); retry once
        import traceback
        attempts = int(os.environ.get("MVT_PREFLIGHT_ATTEMPT", "0"))
        if attempts >= 1:
            raise
        traceback.print_exc()
        print("# preflight attempt failed; re-exec retry", flush=True)
        os.environ["MVT_PREFLIGHT_ATTEMPT"] = str(attempts + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
