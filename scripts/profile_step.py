"""Device-trace profile of the flagship fused step (VERDICT r1 item 2).

Runs one scan-chunk of the real train step under jax.profiler.trace and
aggregates the trace-viewer JSON by op name — the instrument that attributes
step wall-time the XLA cost model can't (it counts scan bodies once and has
no schedule).  Works on the axon remote-TPU plugin (verified: xplane +
trace.json.gz are written).

Env: VTS_PROF_ABLATE (default 'no_lpips,no_d3'), VTS_PROF_SIZE (1536),
VTS_PROF_SCAN (10), VTS_PROF_TOP (30), VTS_PROF_DIR (/tmp/vts_prof).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def aggregate_trace(trace_dir: str, top: int = 30):
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("[prof] no trace.json.gz found under", trace_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pick pids whose process name mentions TPU/device
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if any(s in n.lower() for s in ("tpu", "device", "xla"))
                and "host" not in n.lower()}
    by_name = defaultdict(float)
    count = defaultdict(int)
    meta = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = float(e.get("dur", 0.0))  # µs
        name = e.get("name", "?")
        by_name[name] += dur
        count[name] += 1
        total += dur
        if name not in meta and e.get("args"):
            meta[name] = e["args"]
    print(f"[prof] device lanes {sorted(dev_pids)} "
          f"({ {p: pid_names[p] for p in dev_pids} }), total {total/1e3:.1f} ms")
    show_args = os.environ.get("VTS_PROF_ARGS", "")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"[prof] {dur/1e3:9.2f} ms  ×{count[name]:<5d} {name[:110]}")
        if show_args and name in meta:
            # the xplane args carry the HLO op metadata (jax source path,
            # shape/layout) — the attribution the bare fusion name lacks
            for k, v in meta[name].items():
                vs = str(v)
                if len(vs) > 400:
                    vs = vs[:400] + "…"
                print(f"[prof]            {k}: {vs}")
    # second table: wall-time per emitting source line (the sum over all the
    # small fusions each python-level op expands into)
    by_src = defaultdict(float)
    for name, dur in by_name.items():
        if count[name] > 1 or "while" not in name:
            src = meta.get(name, {}).get("source", "<no-source>")
            by_src[src] += dur
    print("[prof] --- by source line ---")
    for src, dur in sorted(by_src.items(), key=lambda kv: -kv[1])[:top]:
        print(f"[prof] {dur/1e3:9.2f} ms  {src}")


def main():
    size = int(os.environ.get("VTS_PROF_SIZE", "1536"))
    scan_k = int(os.environ.get("VTS_PROF_SCAN", "10"))
    ablate = os.environ.get("VTS_PROF_ABLATE", "no_lpips,no_d3")
    top = int(os.environ.get("VTS_PROF_TOP", "30"))
    trace_dir = os.environ.get("VTS_PROF_DIR", "/tmp/vts_prof")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/vts_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from bench import apply_ablation, build_opt
    from vts_tpu.data import create_dataset
    from vts_tpu.models import create_model

    opt = apply_ablation(build_opt(size, "bfloat16"), ablate)
    if os.environ.get("VTS_PROF_STEPMODE"):
        opt.step_mode = os.environ["VTS_PROF_STEPMODE"]
    if os.environ.get("VTS_PROF_CROP"):
        opt.lpips_crop = int(os.environ["VTS_PROF_CROP"])
    if os.environ.get("VTS_PROF_REMAT"):
        opt.remat_g = os.environ["VTS_PROF_REMAT"]
    if os.environ.get("VTS_PROF_LPIPSREMAT"):
        opt.lpips_remat = os.environ["VTS_PROF_LPIPSREMAT"]
    batches = list(create_dataset(opt))
    batch_n = int(os.environ.get("VTS_PROF_BATCH", "1"))
    if batch_n > 1:
        import itertools
        import numpy as np
        singles = list(itertools.islice(itertools.cycle(batches), batch_n))
        batches = [{k: np.concatenate([b[k] for b in singles], axis=0)
                    for k in singles[0]}]
    model = create_model(opt)
    model.setup(batches[0])
    device_inputs = []
    for b in batches:
        model.set_input(b)
        device_inputs.append(dict(model._input))
    picks = [device_inputs[i % len(device_inputs)] for i in range(scan_k)]
    chunk = {k: jnp.stack([p[k] for p in picks]) for k in picks[0]}
    jax.block_until_ready(chunk)

    epoch = int(os.environ.get("VTS_PROF_EPOCH", "1"))  # ≥ warmup+1 → D3 on
    model.optimize_parameters_chunk(chunk, epoch=epoch)  # compile
    _ = model.get_current_losses()
    with jax.profiler.trace(trace_dir):
        model.optimize_parameters_chunk(chunk, epoch=epoch)
        _ = model.get_current_losses()
    print(f"[prof] traced one {scan_k}-step chunk (ablate={ablate!r}, "
          f"epoch={epoch})", file=sys.stderr)
    aggregate_trace(trace_dir, top)


if __name__ == "__main__":
    main()
