"""Stage-isolation probe for the sweep kernel on TPU: times stripped variants
to attribute the frame cost. Throwaway diagnostic (not product code)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from functools import partial

R, U, P = 256, 512, 6
C = 5 + 4 * P
Z = R

key = jax.random.PRNGKey(0)
vol = (jax.random.uniform(key, (Z, R, R, C)) * 0.1).astype(jnp.bfloat16)
_ = float(vol[0, 0, 0, 0].astype(jnp.float32))
print(f"vol ready {vol.nbytes/1e6:.0f}MB")

o_p = jnp.asarray([-2.6, 0.0, 0.3])
gx = jnp.linspace(-1.0, 1.0, U)
gy = jnp.linspace(-1.0, 1.0, U)
qx = jnp.broadcast_to(gx[None, :], (U, U))
qy = jnp.broadcast_to(gy[:, None], (U, U))
z_ref = -1.0
L = jnp.sqrt((qx - o_p[1]) ** 2 + (qy - o_p[2]) ** 2 + (z_ref - o_p[0]) ** 2)
bc = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (P, 3)), jnp.float32)


def interp(src, n):
    i = jax.lax.broadcasted_iota(jnp.float32, (src.shape[0], n), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - i)).astype(jnp.bfloat16)


def hsv_edit(final, pxs, pys, zk):
    from palettenerf_tpu.utils.color import hsv_to_rgb, rgb_to_hsv
    hsv = rgb_to_hsv(final)
    w = jnp.exp(-((pxs - 0.2) ** 2 + (pys) ** 2 + (zk) ** 2) / 0.4)[..., None, None]
    hsv2 = jnp.stack([jnp.mod(hsv[..., 0] + 120.0, 360.0), hsv[..., 1], hsv[..., 2]], -1)
    return final + w * (hsv_to_rgb(hsv2) - final)


@partial(jax.jit, static_argnames=("mode",))
def sweep(vol, mode: str):
    inv_denom = 1.0 / (z_ref - o_p[0])
    dz = 2.0 / (Z - 1)
    delta = jnp.abs(dz * inv_denom) * L
    z_vals = -1.0 + dz * jnp.arange(Z, dtype=jnp.float32)

    def step(carry, k):
        T, rgb_acc = carry
        slc = jax.lax.dynamic_index_in_dim(vol, k, 0, keepdims=False)
        zk = z_vals[k]
        lam = (zk - o_p[0]) * inv_denom
        sx = (o_p[1] + (gx - o_p[1]) * lam + 1.0) / 2.0 * (R - 1)
        sy = (o_p[2] + (gy - o_p[2]) * lam + 1.0) / 2.0 * (R - 1)
        A = interp(sx, R)
        B = interp(sy, R)
        t1 = jax.lax.dot_general(A, slc.reshape(R, R * C), (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32).reshape(U, R, C)
        if mode == "mm1":
            return (T, rgb_acc + t1[:, :, :3].mean(1, keepdims=True) * 1e-6), None
        feat = jax.lax.dot_general(B, t1, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        if mode == "mm2":
            sigma, rgb = feat[..., 0], feat[..., 1:4]
        else:
            sigma = feat[..., 0]
            om = feat[..., 4:4 + P]
            off = feat[..., 4 + P:4 + 4 * P].reshape(U, U, P, 3)
            rad = feat[..., 4 + 4 * P:4 + 4 * P + 1]
            final = jax.nn.softplus(rad)[..., None] * (bc + off)
            if mode == "edit":
                pxs = o_p[1] + (qx - o_p[1]) * lam
                pys = o_p[2] + (qy - o_p[2]) * lam
                final = hsv_edit(final, pxs, pys, zk)
            rgb = (om[..., None] * final).sum(-2)
        alpha = jnp.where(T > 1e-2, 1.0 - jnp.exp(-sigma * delta), 0.0)
        w = T * alpha
        return (T * (1.0 - alpha), rgb_acc + w[..., None] * rgb), None

    (T, rgb_acc), _ = jax.lax.scan(
        step, (jnp.ones((U, U)), jnp.zeros((U, U, 3))), jnp.arange(Z))
    return rgb_acc


for mode in ["mm1", "mm2", "blend", "edit"]:
    out = sweep(vol, mode)
    _ = float(out.sum())
    t0 = time.time()
    for _i in range(4):
        out = sweep(vol, mode)
    _ = float(out[0, 0, 0])
    ms = 1000 * (time.time() - t0) / 4
    print(f"{mode:6s}: {ms:7.1f} ms")
