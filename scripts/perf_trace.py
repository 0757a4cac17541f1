"""Device-op profile of the guidance Adam loop: where do the 2 ms go?"""
import glob
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pstl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")

import jax

src = open("/root/repo/scripts/perf_micro2.py").read().split("if __name__")[0]
src = src.replace(
    "os.path.dirname(os.path.dirname(os.path.abspath(__file__)))",
    repr("/root/repo"))
exec(src)

fn = jax.jit(adam_fori(loss_fused))
out = jax.block_until_ready(fn(mu0))
for _ in range(3):
    out = fn(mu0)
jax.block_until_ready(out)

tdir = "/tmp/pstl_trace"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    for _ in range(10):
        out = fn(mu0)
    jax.block_until_ready(out)

# parse the xplane
paths = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
print("xplanes:", paths)
pd = jax.profiler.ProfileData.from_file(paths[0])
from collections import defaultdict
dur = defaultdict(float)
cnt = defaultdict(int)
for plane in pd.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    print("plane:", plane.name)
    for line in plane.lines:
        for ev in line.events:
            d = (ev.end_ns - ev.start_ns) / 1e3   # us
            dur[ev.name] += d
            cnt[ev.name] += 1
tot = sum(dur.values())
print(f"total accounted: {tot/1e3:.3f} ms over 10 calls")
for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{d/10:9.1f} us/call x{cnt[name]//10:4d}  {name[:110]}")
