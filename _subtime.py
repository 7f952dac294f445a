import os, time
import numpy as np
os.environ.setdefault("MMMOT_BENCH_CHUNK", "32")
import jax, jax.numpy as jnp
from mmmot_tpu.configs import flagship
from mmmot_tpu.models import model_entry
from mmmot_tpu.tracker import TrackingModule
from mmmot_tpu.tracker.sequence import _compact_indices, _chunked
from mmmot_tpu.ops.crop_resize import crop_and_resize_gathered, normalize_crops
from mmmot_tpu.ops.frustum import frustum_sample_batched
from mmmot_tpu.utils.jax_setup import setup_jax
setup_jax()

S, T, N, P, CROP = 8, 32, 32, 512, 224
H, W, M = 384, 1248, 16384
CHUNK = 32
rng = np.random.default_rng(0)
images = jnp.asarray(rng.integers(0, 256, (S, T, H, W, 3)), jnp.uint8)
clouds = np.zeros((S, T, M, 4), np.float32)
clouds[..., 0] = rng.uniform(-25, 25, (S, T, M)); clouds[..., 1] = rng.uniform(-3, 3, (S, T, M))
clouds[..., 2] = rng.uniform(2, 70, (S, T, M)); clouds[..., 3] = rng.uniform(0, 1, (S, T, M))
clouds = jnp.asarray(clouds)
proj = jnp.asarray([[720.0, 0, W/2, 40.0], [0, 720.0, H/2, 1.0], [0, 0, 1, 0.003]], jnp.float32)
det_counts = rng.integers(3, 17, (S, T))
det_mask = jnp.asarray(np.arange(N)[None, None, :] < det_counts[..., None])
cx = rng.uniform(100, W-100, (S,T,N)); cy = rng.uniform(100, H-80, (S,T,N))
bw = rng.uniform(40, 160, (S,T,N)); bh = rng.uniform(30, 90, (S,T,N))
boxes = jnp.asarray(np.stack([cx-bw/2, cy-bh/2, cx+bw/2, cy+bh/2], -1).astype(np.float32))
compact = 384

cfg = flagship(compute_dtype="bfloat16", max_dets=N, crop=CROP, point_len=P)
net = model_entry(cfg.model)
dummy = {"crops": jnp.zeros((1,2,2,CROP,CROP,3), jnp.float32),
         "points": jnp.zeros((1,2,2,P,4), jnp.float32),
         "point_mask": jnp.ones((1,2,2,P), bool), "det_mask": jnp.ones((1,2,2), bool)}
variables = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(jax.random.PRNGKey(0), dummy)
module = TrackingModule(net, variables, cfg.assoc)

def prep_one(im, cl, bx, dm):
    Tn, Nn = dm.shape
    idx, taken = _compact_indices(dm, compact)
    tsel = idx // Nn
    boxes_c = bx.reshape(Tn*Nn, 4)[idx]
    def ex(args):
        ts_k, bx_k, m_k = args
        crops_k = crop_and_resize_gathered(im, ts_k, bx_k, (CROP, CROP), mask=m_k, window=512)
        crops_k = normalize_crops(crops_k, scale=1.0/255.0)
        cl_k = cl[ts_k]
        p_k, pm_k = frustum_sample_batched(cl_k, bx_k[:, None, :], proj, P, det_mask=m_k[:, None])
        return {"c": crops_k, "p": p_k[:, 0], "pm": pm_k[:, 0]}
    out = _chunked(ex, (tsel, boxes_c, taken), compact, CHUNK)
    return out

def extract_one(crops_c, pts_c, pm_c):
    def ex(args):
        c_, p_, pm_ = args
        return module.extract(c_, p_, pm_, jnp.ones((c_.shape[0],), bool))
    return _chunked(ex, (crops_c, pts_c, pm_c), compact, CHUNK)

prep = jax.jit(jax.vmap(prep_one))
pre = jax.block_until_ready(prep(images, clouds, boxes, det_mask))

def extract_b(c, p, pm):
    return jax.vmap(extract_one)(c, p, pm)
extract = jax.jit(extract_b)
fe = jax.block_until_ready(extract(pre["c"], pre["p"], pre["pm"]))

def timeit(f, *a, n=3):
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
        jax.tree.map(lambda x: np.asarray(x) if hasattr(x, 'shape') and x.size < 100 else x, out)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

tp = timeit(prep, images, clouds, boxes, det_mask)
te = timeit(extract, pre["c"], pre["p"], pre["pm"])
print(f"prep (crop+frustum): {tp*1e3:.1f} ms")
print(f"extract (VGG+PointNet+fusion): {te*1e3:.1f} ms")
print(f"sum: {(tp+te)*1e3:.1f} ms; full pipeline at 364 FPS = {8*32/364.1*1e3:.1f} ms")
