"""Train-step decomposition on the real TPU (chained-truth method).

Pieces: (a) full step (fwd+loss+bwd+SGD+EMA), (b) fwd+loss only,
(c) loss-only grad on frozen feats (assigner+loss fwd+bwd cost).
The difference (a)-(b)-(c) is the model backward. Timing rules per
docs/performance.md "How to measure" — chained executables only.

Usage: python benchmarks/train_decomp.py   (on a healthy axon tunnel)
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
from yolo_ad_refine_tpu.models.model import build_detection_model
from yolo_ad_refine_tpu.train.loss import DetectionLoss
from yolo_ad_refine_tpu.train.optim import build_optimizer
from yolo_ad_refine_tpu.train.step import TrainState, make_train_step
from yolo_ad_refine_tpu.utils import ROOT

B, IMGSZ, MAXB = 16, 640, 64
model = build_detection_model(
    str(ROOT / "cfg" / "models" / "yolo11-701-YOLO-AD-Refine.yaml"),
    dtype=jnp.bfloat16, imgsz=256)
loss_fn = DetectionLoss(nc=model.nc, strides=model.strides)
tx, _, _ = build_optimizer(model.variables["params"], lr0=0.01, epochs=100,
                           nb=100, batch=B, nbs=B)
state = TrainState.create(model.variables, tx)
r = np.random.default_rng(0)
batch = {
    "img": jnp.asarray(r.integers(0, 255, (B, IMGSZ, IMGSZ, 3)), jnp.uint8),
    "cls": jnp.asarray(r.integers(0, model.nc, (B, MAXB, 1)), jnp.float32),
    "bboxes": jnp.tile(jnp.asarray([8.0, 8.0, 64.0, 64.0], jnp.float32), (B, MAXB, 1)),
    "mask": jnp.ones((B, MAXB, 1), jnp.float32),
}

def chained_time(make_fn, label, k=4):
    """fn(c) -> c' chained k times in one jit; report (t_k - t_1)/(k-1)."""
    def runner(kk):
        @jax.jit
        def go(c0):
            def body(i, c):
                return make_fn(c)
            return jax.lax.fori_loop(0, kk, body, c0)
        c = jnp.float32(0.0)
        t0 = time.perf_counter(); v = float(go(c)); t1 = time.perf_counter()
        # second call = cached executable, pure runtime
        t0 = time.perf_counter(); v = float(go(jnp.float32(1e-6))); t1 = time.perf_counter()
        return t1 - t0
    t1 = runner(1); tk = runner(k)
    print(f"[{label}] k=1 {t1*1e3:.1f} ms, k={k} {tk*1e3:.1f} ms -> {(tk-t1)/(k-1)*1e3:.2f} ms/iter", flush=True)

# (b) fwd + loss only
vars0 = state.variables
def fwd_loss_carry(c):
    img = batch["img"].astype(jnp.bfloat16) / 255.0 + c * 0.0
    feats, _ = model.graph.apply(vars0, img, train=True, mutable=["batch_stats"])
    out = loss_fn(feats, batch["cls"], batch["bboxes"], batch["mask"])
    return out.total.astype(jnp.float32) * 1e-12 + c
chained_time(fwd_loss_carry, "fwd+loss bs16", 4)

# (c) loss-only grad on frozen feats
feats0, _ = jax.jit(lambda v, im: model.graph.apply(v, im, train=True, mutable=["batch_stats"]))(
    vars0, batch["img"].astype(jnp.bfloat16) / 255.0)
feats0 = jax.tree.map(lambda a: a, feats0)
def loss_grad_carry(c):
    def f(feats):
        fs = jax.tree.map(lambda a: a + c.astype(a.dtype) * 0.0, feats)
        return loss_fn(fs, batch["cls"], batch["bboxes"], batch["mask"]).total
    val, g = jax.value_and_grad(f)(feats0)
    return val.astype(jnp.float32) * 1e-12 + jnp.sum(g[0]).astype(jnp.float32) * 1e-12 + c
chained_time(loss_grad_carry, "loss fwd+bwd on frozen feats", 4)

# (a) full step, chained via loss carry
step = make_train_step(model.graph, loss_fn, tx)
@jax.jit
def full_k(state, k_dummy):
    s = state
    m = None
    for i in range(3):
        s, m = step(s, batch, jax.random.PRNGKey(i))
    return s, m
t0 = time.perf_counter()
s1, m1 = jax.jit(lambda s: step(s, batch, jax.random.PRNGKey(0)))(state)
print("single step compile+run", time.perf_counter() - t0, flush=True)
float(m1["loss"])
t0 = time.perf_counter()
s3, m3 = full_k(s1, 0)
float(m3["loss"])
t3 = time.perf_counter() - t0
print(f"[full step x3 chained] {t3*1e3:.1f} ms -> {t3/3*1e3:.1f} ms/step (incl once-cost)", flush=True)
