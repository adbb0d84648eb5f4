import sys
import bench
from scd_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
ue = bench.bench_uno_e2e_step()
print(f"[bench] uno_v2 e2e train step: {ue:.0f} imgs/sec/chip", file=sys.stderr)
out = bench.bench_e2e()
import json
print(json.dumps(out))
