"""Produce the scaling-efficiency artifact (SCALING_r{N}.json).

Runs the end-to-end sharded GOP encode at 1/2/4/8 devices via
parallel/gop_device.measure_scaling. On this CI host the devices are
XLA virtual CPU devices sharing one socket, so the numbers are
INDICATIVE ONLY (they mostly measure that the sharded program
parallelizes without serializing on collectives, not real chip
throughput); on a pod slice each mesh column is a chip and the
BASELINE.json target is >= 80% efficiency.

Usage: python tools/run_scaling.py [out.json]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")

from h264_fer_tpu.parallel.gop_device import measure_scaling  # noqa: E402

W, H, QP, NF = 352, 288, 28, 16
fps = measure_scaling(W, H, QP, n_frames=NF, device_counts=(1, 2, 4, 8),
                      reps=3)
base = fps.get(1)
out = {
    "workload": f"all-intra {W}x{H} qp{QP}, {NF} frames, GOP-axis DP",
    "backend": jax.default_backend(),
    "note": ("virtual CPU mesh — devices share host cores; efficiency "
             "is indicative only, the >=80% BASELINE target applies to "
             "real chips"),
    "fps": {str(k): round(v, 2) for k, v in fps.items()},
    "efficiency_pct": {
        str(k): round(100.0 * v / (base * k), 1) for k, v in fps.items()
    },
}
path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_r04.json"
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
