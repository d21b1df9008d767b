"""Compare one fused jit(forward+post) vs two dispatches jit(forward); jit(post)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pytorch_retinanet_tpu.models import RetinaNetModule
from pytorch_retinanet_tpu.models.retinanet import apply_detector
from pytorch_retinanet_tpu.ops import generate_anchors_per_level, process_detections_multilevel_batch

B = 32
size = (800, 1344)
module = RetinaNetModule(backbone_kind="resnet50", num_classes=90)
variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, *size, 3), jnp.float32))
anchors_levels = [jnp.asarray(a) for a in generate_anchors_per_level(size)]
images = jnp.asarray(np.random.default_rng(0).random((B, *size, 3), dtype=np.float32))
sizes = jnp.tile(jnp.asarray([[800.0, 1333.0]], jnp.float32), (B, 1))

@jax.jit
def fused(variables, images, sizes):
    cls_l, box_l = apply_detector(module, variables, images, return_levels=True)
    return process_detections_multilevel_batch(cls_l, box_l, anchors_levels, sizes)

@jax.jit
def fwd(variables, images):
    return apply_detector(module, variables, images, return_levels=True)

@jax.jit
def post(cls_l, box_l, sizes):
    return process_detections_multilevel_batch(cls_l, box_l, anchors_levels, sizes)

def bench(fn, *args, iters=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3

ms_fused = bench(fused, variables, images, sizes)

def split(variables, images, sizes):
    cls_l, box_l = fwd(variables, images)
    return post(cls_l, box_l, sizes)

ms_split = bench(split, variables, images, sizes)
print(f"fused one-program : {ms_fused:8.2f} ms/batch  ({B/ms_fused*1e3:.1f} img/s)")
print(f"split two-dispatch: {ms_split:8.2f} ms/batch  ({B/ms_split*1e3:.1f} img/s)")
