"""bench.py's hand-built opt must track the shipped CLI defaults.

The headline benchmark (bench.py build_opt) constructs a SimpleNamespace
instead of going through the 3-stage option parse (it predates the CLI and
avoids argparse in the hot path). That opens a drift hazard: flip a sinskit
default (as round 3 did with --lpips_fold) and the bench silently measures a
different model than users run. Pin every shared field to the TrainOptions
default, with an explicit allowlist for the fields bench intentionally sets
differently (shapes, schedule, data plumbing).
"""

import bench
from vts_tpu.config import TrainOptions

# fields bench deliberately sets away from the CLI default, with the reason
INTENTIONAL = {
    "dataroot",          # synthetic benchmark garment
    "data_len",          # 2 cached samples suffice for steady-state stepping
    "num_threads",       # host prep is timed separately
    "name", "checkpoints_dir",          # scratch dirs
    "batch_size_G2", "batch_size_G2_val",  # flagship 64-patch economy is set
                                           # explicitly (CLI default matches)
    "getIntermFeat_D",   # pix2pixHD-only flag, irrelevant to sinskit
    "dtype",             # bench measures the bf16 TPU config (VTS_BENCH_DTYPE);
                         # the CLI default stays float32 for parity-first runs
}


def test_bench_opt_matches_cli_defaults():
    cli = TrainOptions().parse(
        ["--model", "sinskit", "--dataroot", "synthetic://x",
         "--checkpoints_dir", "/tmp/bc"], quiet=True)
    b = bench.build_opt(1536, "bfloat16")
    mismatches = {}
    for key, bval in vars(b).items():
        if key in INTENTIONAL or not hasattr(cli, key):
            continue
        cval = getattr(cli, key)
        if key == "crop_size":
            cval = 1536  # bench size arg; CLI flagship default is also 1536
        if bval != cval:
            mismatches[key] = (bval, cval)
    # fields where the flagship CLI default differs because bench pins the
    # PAPER config explicitly: none expected — keep this assert exhaustive
    assert not mismatches, (
        "bench.build_opt drifted from the shipped sinskit defaults: "
        f"{mismatches} (bench, cli). Either fix bench.py or add the field "
        "to INTENTIONAL with a reason.")


def test_bench_dtype_and_size_plumb():
    b = bench.build_opt(512, "float32", mult=2)
    assert b.crop_size == 512 and b.dtype == "float32"
    assert b.T_resolution_multiplier == 2
