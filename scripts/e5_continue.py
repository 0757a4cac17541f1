"""Continue e5 DDPM training from its checkpoint (+140 epochs).

Round-2 quality scaling: open/closed-loop compliance rose monotonically
with e5 budget (150 -> 290 epochs: open-loop 0.411 -> 0.457, closed-loop
+guidance 0.703 -> 0.851), so this is the knob future rounds should keep
turning.  Saves models_e5b; scripts/e7_v2_retrain.py (E7V2_SRC=models_e5b)
builds the RefineNet on top.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pstl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
from pstl_tpu import train
from pstl_tpu.config import PRESETS
from pstl_tpu.data.dataset import SceneDataset
OUT = "exps/e2e_r2"
T0 = time.time()
def log(m): print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)
base = dict(n_randoms=64, n_neighbors=8, batch_size=16)
cfg = PRESETS["e5_ddpm"].with_(**base).with_(
    epochs=140, net_pretrained_path=os.path.join(OUT, "models_e5"))
ds = SceneDataset.load(os.path.join(OUT, "cache_aug.npz"), cfg)
log("continuing e5 +140 epochs...")
st = train.train(cfg.with_(exp_name=None), ds, log=log)
train.save_checkpoint(os.path.join(OUT, "models_e5b"), st, 0)
log("saved models_e5b")
