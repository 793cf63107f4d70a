"""Stage-1 NeRF trainer: jitted train/eval steps, EMA, schedules, checkpoints, logging.

Functional re-design of the reference ``Trainer`` (``nerf/utils.py:332-1205``):
- Adam(betas=(0.9, 0.99), eps=1e-15) with lr decay ``0.1**(step/iters)`` applied every
  step (main_nerf.py:143-151) — via optax.
- EMA of parameters with decay 0.95 (``ExponentialMovingAverage`` in the reference).
- Density-grid refresh every ``update_extra_interval`` steps (nerf/utils.py:883-885),
  frustum culling of never-seen cells at train start (:662-663).
- Random per-pixel background compositing for RGBA gt (:514-525), loss =
  MSE + lambda_sparse * rgb_norm (:535-536), error-map EMA update (:556-578).
- Rolling checkpoints + best-checkpoint with EMA weights, autoload policies
  (:442-460, :1083-1205).

The whole train step (render + loss + backward + optimizer + EMA) is ONE jitted XLA
program; the only host work per step is pixel sampling and the H2D ray upload. bf16
compute is applied inside the MLPs when ``cfg.fp16`` (AMP equivalent).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.nerf import NeRFSpec, init_nerf, nerf_density
from ..ops.occupancy import GridState, init_grid_state, mark_untrained_grid, update_density_grid
from ..render.nerf_renderer import RenderSettings, render_nerf_eval, render_nerf_train
from ..utils.color import srgb_to_linear
from . import checkpoint as ckpt_lib
from .metrics import PSNRMeter


class Trainer:
    """NeRF trainer. ``opt`` is a Config; model state = (spec, params)."""

    def __init__(
        self,
        name: str,
        opt: Config,
        spec: NeRFSpec,
        params=None,
        workspace: str = "workspace",
        metrics=None,
        use_checkpoint: str = "latest",
        ema_decay: Optional[float] = 0.95,
        eval_interval: int = 50,
        max_keep_ckpt: int = 2,
        mute: bool = False,
    ):
        import optax

        self.name = name
        self.opt = opt
        self.spec = spec
        self.workspace = workspace
        self.metrics = metrics if metrics is not None else [PSNRMeter()]
        self.ema_decay = ema_decay
        self.eval_interval = eval_interval
        self.max_keep_ckpt = max_keep_ckpt
        self.mute = mute

        self.epoch = 0
        self.global_step = 0
        self.stats = {"loss": [], "valid_loss": [], "results": [], "best_result": None}
        # PaletteTrainer sets True: its occupancy grid is inherited frozen from the
        # NeRF checkpoint (reference palette/utils.py:644-646 — no update_extra_state)
        self.grid_frozen = False

        os.makedirs(workspace, exist_ok=True)
        self.ckpt_path = os.path.join(workspace, "checkpoints")
        os.makedirs(self.ckpt_path, exist_ok=True)
        self.best_path = os.path.join(self.ckpt_path, f"{name}.ckpt")
        self.log_path = os.path.join(workspace, f"log_{name}.txt")

        # tensorboard scalars (reference: nerf/utils.py writer; palette/utils.py:734-738)
        self.writer = None
        try:
            import tensorboardX

            self.writer = tensorboardX.SummaryWriter(os.path.join(workspace, "run", name))
        except Exception:
            pass

        # data-parallel ray sharding over a device mesh (SURVEY.md §2.3: replicated
        # params + ray-DP is the optimal mapping for this model family)
        self.mesh = None
        if opt.n_devices > 1:
            from ..parallel.mesh import make_mesh

            assert opt.num_rays % opt.n_devices == 0, (
                f"num_rays={opt.num_rays} must divide n_devices={opt.n_devices}")
            self.mesh = make_mesh(opt.n_devices, axis="dp")
            self.log(f"[INFO] DP mesh over {opt.n_devices} devices (ray-sharded)")

        self.key = jax.random.PRNGKey(opt.seed)
        if params is None:
            self.key, k = jax.random.split(self.key)
            params = init_nerf(k, spec)
        self.params = params
        self.ema_params = jax.tree_util.tree_map(jnp.array, params)

        cascade = spec_cascade(spec)
        self.grid_state = init_grid_state(cascade, opt.grid_size)

        self.train_settings = RenderSettings(
            bound=spec.bound, cascade=cascade, grid_size=opt.grid_size,
            dt_gamma=opt.dt_gamma, max_steps=opt.max_steps,
            num_samples=opt.train_samples_per_ray, t_thresh=opt.t_thresh_train,
            min_near=opt.min_near, bg_radius=spec.bg_radius,
            march_groups=self._march_groups(opt.train_samples_per_ray),
            compact_frac=getattr(opt, "train_compact_frac", 0.0),
        )
        s_inf = opt.infer_samples_per_ray
        rounds = self._compaction_rounds(s_inf)
        # eval-only fine culling grid (bake_fine_bitfield): the marcher tests a
        # finer bitfield baked lazily from the trained field at render time,
        # with a dt-aware per-sample fallback to the train grid (grid_size and
        # the dt schedule stay the train values — integration is unchanged)
        fine = int(getattr(opt, "eval_fine_grid", 0))
        self._fine_bitfield = None
        self.eval_settings = RenderSettings(
            bound=spec.bound, cascade=cascade, grid_size=opt.grid_size,
            dt_gamma=opt.dt_gamma, max_steps=opt.max_steps,
            num_samples=s_inf, t_thresh=opt.t_thresh_infer,
            min_near=opt.min_near, bg_radius=spec.bg_radius,
            compaction_rounds=rounds,
            march_groups=self._march_groups(s_inf, exact=True),
            compact_frac=getattr(opt, "eval_compact_frac", 0.0),
            fine_grid_size=fine,
        )

        # optimizer: Adam + per-step 0.1^(t/T) decay (main_nerf.py:141-151)
        lr_fn = lambda step: opt.lr * (0.1 ** jnp.minimum(step / opt.iters, 1.0))
        self.tx = optax.adam(learning_rate=lr_fn, b1=0.9, b2=0.99, eps=1e-15)
        self.opt_state = self.tx.init(self.params)

        self._build_jit_fns()

        self.log(f"[INFO] Trainer: {name} | {workspace} | "
                 f"{sum(x.size for x in jax.tree_util.tree_leaves(params))} params")

        if use_checkpoint == "scratch":
            self.log("[INFO] Training from scratch ...")
        elif use_checkpoint in ("latest", "latest_model"):
            self.load_checkpoint(model_only=use_checkpoint == "latest_model")
        elif use_checkpoint == "best":
            if os.path.exists(self.best_path):
                self.load_checkpoint(self.best_path)
            else:
                self.load_checkpoint()
        else:
            self.load_checkpoint(use_checkpoint)

    # ------------------------------------------------------------------ jit fns

    def _build_jit_fns(self):
        spec = self.spec
        opt = self.opt
        tset = self.train_settings
        eset = self.eval_settings
        decay = self.ema_decay

        from ..parallel.mesh import shard_rays
        mesh = self.mesh

        def train_step(params, opt_state, ema, bitfield, key, rays_o, rays_d, images):
            k_bg, k_pt = jax.random.split(key)
            rays_o, rays_d, images = shard_rays(mesh, rays_o, rays_d, images)
            c = images.shape[-1]
            img = images
            if opt.color_space == "linear":
                img = img.at[..., :3].set(srgb_to_linear(img[..., :3]))
            if c == 4 and spec.bg_radius <= 0 and not opt.no_bg:
                bg = jax.random.uniform(k_bg, (img.shape[0], 3))
                gt = img[..., :3] * img[..., 3:] + bg * (1.0 - img[..., 3:])
            else:
                bg = jnp.ones((3,), jnp.float32)
                gt = img[..., :3]

            def loss_fn(p):
                out = render_nerf_train(
                    p, spec, bitfield, rays_o, rays_d, k_pt, tset,
                    bg_color=bg, rays_gt=gt, perturb=True,
                )
                per_ray = ((out["image"] - gt) ** 2).mean(-1)
                per_ray = per_ray + out["rgb_norm"] * opt.lambda_sparse
                loss = per_ray.mean()
                if opt.patch_size > 1 and opt.lambda_lpips > 0:
                    # perceptual patch loss over the sampled pixel patches
                    # (reference nerf/utils.py:542-550; random-feature LPIPS here
                    # since no pretrained weights ship with the image)
                    from .metrics import rlpips_distance

                    ps = opt.patch_size
                    pr = out["image"].reshape(-1, ps, ps, 3)
                    gtp = gt.reshape(-1, ps, ps, 3)
                    loss = loss + opt.lambda_lpips * rlpips_distance(
                        self._rlpips_kernels, pr, gtp)
                return loss, per_ray

            (loss, per_ray), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            if decay is not None:
                ema = jax.tree_util.tree_map(
                    lambda e, p: e * decay + p * (1.0 - decay), ema, params
                )
            return params, opt_state, ema, loss, per_ray

        if opt.patch_size > 1 and getattr(opt, "lambda_lpips", 0.0) > 0:
            from .metrics import make_rlpips_kernels

            self._rlpips_kernels = make_rlpips_kernels()

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))

        def density_fn(params, pts):
            # chunked to bound peak memory (2M grid points per refresh)
            chunks = pts.reshape(64, -1, 3)
            return jax.lax.map(
                lambda c: nerf_density(params, spec, c)["sigma"], chunks
            ).reshape(-1)

        def update_grid(params, grid_state, key):
            return update_density_grid(
                grid_state, partial(density_fn, params), key,
                bound=spec.bound, density_thresh=opt.density_thresh,
                grid_size=opt.grid_size,
            )

        self._update_grid = jax.jit(update_grid, donate_argnums=(1,))

        def update_grid_partial(params, grid_state, key, slab):
            return update_density_grid(
                grid_state, partial(density_fn, params), key,
                bound=spec.bound, density_thresh=opt.density_thresh,
                grid_size=opt.grid_size, partial_fraction=4, slab_index=slab,
            )

        self._update_grid_partial = jax.jit(update_grid_partial, donate_argnums=(1,))

        def eval_chunk(params, bitfield, rays_o, rays_d, bg_color):
            # eval renders shard over the ray axis too (the reference only ever
            # all_gathers eval predictions, nerf/utils.py:977-992; here XLA
            # partitions the whole render and gathers the outputs)
            from ..parallel.mesh import shard_rays
            rays_o, rays_d = shard_rays(self.mesh, rays_o, rays_d)
            return render_nerf_eval(params, spec, bitfield, rays_o, rays_d, eset, bg_color)

        self._eval_chunk = jax.jit(eval_chunk)

        def mark(grid_state, poses, intrinsics):
            return mark_untrained_grid(
                grid_state, poses, intrinsics, spec.bound, opt.min_near,
                opt.filter_close_point, opt.grid_size,
            )

        self._mark_untrained = jax.jit(mark, static_argnums=(2,))

        # ---- scanned fast path: K train steps per dispatch, rays sampled on device
        def loss_fn_factory(bitfield, gt, bg, k_pt):
            def loss_fn(p, rays_o, rays_d):
                out = render_nerf_train(
                    p, spec, bitfield, rays_o, rays_d, k_pt, tset,
                    bg_color=bg, rays_gt=gt, perturb=True,
                )
                per_ray = ((out["image"] - gt) ** 2).mean(-1)
                per_ray = per_ray + out["rgb_norm"] * opt.lambda_sparse
                return per_ray.mean(), per_ray

            return loss_fn

        def scan_steps(params, opt_state, ema, bitfield, key, images, poses,
                       img_idx, intrinsics, H, W):
            # images: [B, H*W, C] preloaded; img_idx: [K] which image per step
            import optax
            from ..data.rays_device import gen_rays_jnp

            c = images.shape[-1]

            def body(carry, idx):
                params, opt_state, ema, key = carry
                key, k_pix, k_bg, k_pt = jax.random.split(key, 4)
                inds = jax.random.randint(k_pix, (opt.num_rays,), 0, H * W)
                pix = images[idx][inds]  # [N, C]
                if opt.color_space == "linear":
                    pix = pix.at[..., :3].set(srgb_to_linear(pix[..., :3]))
                if c == 4 and spec.bg_radius <= 0 and not opt.no_bg:
                    bg = jax.random.uniform(k_bg, (opt.num_rays, 3))
                    gt = pix[..., :3] * pix[..., 3:] + bg * (1.0 - pix[..., 3:])
                else:
                    bg = jnp.ones((3,), jnp.float32)
                    gt = pix[..., :3]
                rays_o, rays_d = gen_rays_jnp(poses[idx], intrinsics, H, W, inds)
                rays_o, rays_d, gt = shard_rays(mesh, rays_o, rays_d, gt)
                loss_fn = loss_fn_factory(bitfield, gt, bg, k_pt)
                (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, rays_o, rays_d)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                if decay is not None:
                    ema = jax.tree_util.tree_map(
                        lambda e, p: e * decay + p * (1.0 - decay), ema, params)
                return (params, opt_state, ema, key), loss

            (params, opt_state, ema, key), losses = jax.lax.scan(
                body, (params, opt_state, ema, key), img_idx)
            return params, opt_state, ema, losses

        self._scan_steps = jax.jit(
            scan_steps, static_argnums=(8, 9, 10), donate_argnums=(0, 1, 2)
        )

    def supports_fast_path(self, train_ds) -> bool:
        opt = self.opt
        return (
            train_ds.images is not None
            and not opt.error_map
            and opt.patch_size == 1
            and getattr(opt, "random_size", 0) == 0
            and getattr(self, "_scan_steps", None) is not None
        )

    def train_one_epoch_fast(self, train_ds):
        """One epoch as ceil(B/interval) scanned dispatches; grid refresh between scans.

        Removes all per-step host work (ray gen, H2D upload, loss sync) — the dominant
        cost observed on TPU with the step-at-a-time loop.
        """
        t0 = time.time()
        if getattr(self, "_dev_images_src", None) is not id(train_ds):
            # (re)upload whenever a different dataset instance is passed — the
            # cache previously never invalidated, silently training on old images
            imgs = train_ds.images
            self._dev_images = jnp.asarray(
                imgs.reshape(imgs.shape[0], -1, imgs.shape[-1]))
            self._dev_poses = jnp.asarray(train_ds.poses)
            self._dev_images_src = id(train_ds)
        B = len(train_ds.poses)
        order = np.random.permutation(B)
        interval = self.opt.update_extra_interval
        intr = tuple(float(v) for v in train_ds.intrinsics)
        losses = []
        for start in range(0, B, interval):
            chunk = order[start:start + interval]
            self.key, k = jax.random.split(self.key)
            self.grid_state = self._refresh_grid(k)
            self.key, k = jax.random.split(self.key)
            self.params, self.opt_state, self.ema_params, ls = self._scan_steps(
                self.params, self.opt_state, self.ema_params, self.grid_state.bitfield,
                k, self._dev_images, self._dev_poses, jnp.asarray(chunk),
                intr, train_ds.H, train_ds.W,
            )
            self.global_step += len(chunk)
            # One tiny scalar readback per scan: the axon tunnel degrades ~3.3x
            # when many executions queue with no intervening sync (round-4
            # measurement, scripts/profile_train_overhead.py: 236 ms/step
            # deferred vs 72 ms/step synced). ~30 ms RTT per scan is noise next
            # to the 1.1 s of queued compute it closes out.
            np.asarray(ls[-1:])
            losses.append(ls)
        avg = float(jnp.concatenate(losses).mean())
        self.stats["loss"].append(avg)
        self._write_scalar("train/loss", avg)
        self.log(f"[epoch {self.epoch}] loss={avg:.6f} "
                 f"({B} steps, {time.time()-t0:.1f}s, step={self.global_step})")

    # ------------------------------------------------------------------ logging

    def _refresh_grid(self, key):
        """Full refresh during warmup, rotating 1/4 partial refresh after
        (static-shape analog of nerf/renderer.py:479-537)."""
        if self.global_step < self.opt.grid_update_warmup or not hasattr(self, "_update_grid_partial"):
            return self._update_grid(self.params, self.grid_state, key)
        slab = jnp.int32(self.global_step // self.opt.update_extra_interval)
        return self._update_grid_partial(self.params, self.grid_state, key, slab)

    def log(self, *args):
        msg = " ".join(str(a) for a in args)
        if not self.mute:
            print(msg, flush=True)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")

    # ------------------------------------------------------------------ training

    def eval_params(self):
        return self.ema_params if self.ema_decay is not None else self.params

    # ------------------------------------------------------------------ fine eval grid

    def _field_density(self, params, pts):
        """Density query for grid bakes (PaletteTrainer overrides with the
        palette field)."""
        return nerf_density(params, self.spec, pts)["sigma"]

    def _eval_bitfield(self):
        """Bitfield for eval renders: the train grid, or (with
        ``--eval_fine_grid``) the pair ``(train, fine)`` where ``fine`` is a
        lazily-baked finer refinement of it (the marcher falls back to the
        train grid per-sample wherever dt outruns the fine cell edge). The
        cache is invalidated whenever params or the train grid change."""
        fine = int(getattr(self.opt, "eval_fine_grid", 0))
        if fine <= 0:
            return self.grid_state.bitfield
        if self._fine_bitfield is None:
            from ..ops.occupancy import bake_fine_bitfield

            params = self.eval_params()
            t0 = time.time()
            self._fine_bitfield = bake_fine_bitfield(
                self.grid_state, partial(self._field_density, params),
                bound=self.spec.bound, density_thresh=self.opt.density_thresh,
                fine_size=fine, grid_size=self.opt.grid_size,
            )
            occ = int(np.unpackbits(np.asarray(self._fine_bitfield)).sum())
            self.log(f"[INFO] baked {fine}^3 eval bitfield in "
                     f"{time.time() - t0:.1f}s ({occ} occupied cells)")
        return (self.grid_state.bitfield, self._fine_bitfield)

    def _ckpt_every(self) -> int:
        """Rolling-save cadence in epochs. A save reads the full param/opt
        state back through the axon tunnel (~7 s / 150 MB for stage 1, ~40 s /
        600 MB for the palette model) — amortize it over ckpt_interval epochs
        there; on local hosts a save is cheap, so the -1 default resolves to
        the reference's per-epoch cadence (nerf/utils.py:941). Crash recovery
        loses at most this many epochs."""
        ck_every = int(getattr(self.opt, "ckpt_interval", -1))
        if ck_every < 0:
            ck_every = 5 if jax.default_backend() == "axon" else 1
        return max(1, ck_every)

    def train(self, train_ds, valid_ds=None, max_epochs: int = 1):
        # frustum-cull never-seen cells once at start (nerf/utils.py:662-663)
        self.grid_state = self._mark_untrained(
            self.grid_state, jnp.asarray(train_ds.poses),
            tuple(float(v) for v in train_ds.intrinsics),
        )
        fast = self.supports_fast_path(train_ds)
        for _ in range(max_epochs - self.epoch):
            self.epoch += 1
            if fast:
                self.train_one_epoch_fast(train_ds)
            else:
                self.train_one_epoch(train_ds)
            self._fine_bitfield = None  # params/grid changed; rebake on next eval
            if self.epoch % self._ckpt_every() == 0 or self.epoch == max_epochs:
                self.save_checkpoint(best=False)
            if valid_ds is not None and self.epoch % self.eval_interval == 0:
                self.evaluate_one_epoch(valid_ds)
                self.save_checkpoint(best=True)
        return self.stats

    def train_one_epoch(self, train_ds):
        t0 = time.time()
        total_loss, steps = 0.0, 0
        for data in train_ds.iter_epoch():
            if self.global_step % self.opt.update_extra_interval == 0:
                self.key, k = jax.random.split(self.key)
                self.grid_state = self._refresh_grid(k)

            self.key, k = jax.random.split(self.key)
            images = jnp.asarray(data["images"])
            self.params, self.opt_state, self.ema_params, loss, per_ray = self._train_step(
                self.params, self.opt_state, self.ema_params, self.grid_state.bitfield,
                k, jnp.asarray(data["rays_o"]), jnp.asarray(data["rays_d"]), images,
            )
            self.global_step += 1
            steps += 1
            total_loss += float(loss)

            if "inds_coarse" in data:
                train_ds.update_error_map(
                    data["index"], data["inds_coarse"], np.asarray(per_ray)
                )
        avg = total_loss / max(steps, 1)
        self.stats["loss"].append(avg)
        self._write_scalar("train/loss", avg)
        self.log(f"[epoch {self.epoch}] loss={avg:.6f} "
                 f"({steps} steps, {time.time()-t0:.1f}s, step={self.global_step})")

    def _write_scalar(self, tag: str, value: float):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, self.global_step)

    # ------------------------------------------------------------------ eval / test

    def render_image(self, rays_o, rays_d, bg_color=None, chunk: int = 16384):
        """Staged full-frame render with a fixed jit chunk size (pad last chunk).

        All chunks are dispatched asynchronously before any host readback — a
        per-chunk ``np.asarray`` would serialize on the tunnel's ~29 ms
        round-trip (40 chunks = 1.2 s/frame of pure latency at 800x800)."""
        n = rays_o.shape[0]
        outs = []
        bg = jnp.ones((3,), jnp.float32) if bg_color is None else jnp.asarray(bg_color)
        params = self.eval_params()
        bitfield = self._eval_bitfield()
        pads = []
        for start in range(0, n, chunk):
            ro = rays_o[start:start + chunk]
            rd = rays_d[start:start + chunk]
            pad = chunk - ro.shape[0]
            if pad:
                ro = np.concatenate([ro, np.tile(ro[-1:], (pad, 1))], 0)
                rd = np.concatenate([rd, np.tile(rd[-1:], (pad, 1))], 0)
            outs.append(self._eval_chunk(params, bitfield,
                                         jnp.asarray(ro), jnp.asarray(rd), bg))
            pads.append(pad)
        overflow = sum(int(np.asarray(out.pop("compact_overflow"))[0])
                       for out in outs if "compact_overflow" in out)
        if overflow > 0:
            # march-valid samples dropped by an undersized --eval_compact_frac
            # (would otherwise silently darken the render)
            self.log(f"[WARN] compact budget overflow: {overflow} valid "
                     f"samples dropped this frame — raise eval_compact_frac")
        outs = [{k: np.asarray(v)[: chunk - pad if pad else chunk]
                 for k, v in out.items()} for out, pad in zip(outs, pads)]
        return {k: np.concatenate([o[k] for o in outs], 0) for k in outs[0]}

    def eval_step_full(self, data, bg_color=None):
        out = self.render_image(data["rays_o"], data["rays_d"], bg_color)
        H, W = data["H"], data["W"]
        return {k: v.reshape(H, W, *v.shape[1:]) for k, v in out.items()}

    def evaluate_one_epoch(self, valid_ds, save_images: bool = True):
        for m in self.metrics:
            m.clear()
        total_loss, n = 0.0, 0
        for i, data in enumerate(valid_ds.iter_epoch()):
            out = self.eval_step_full(data)
            pred = out["image"]
            img = data.get("images")
            if img is not None:
                gt = img[..., :3]
                if img.shape[-1] == 4:
                    gt = img[..., :3] * img[..., 3:] + 1.0 * (1 - img[..., 3:])
                if self.opt.color_space == "linear":
                    gt = np.asarray(srgb_to_linear(jnp.asarray(gt)))
                total_loss += float(((pred - gt) ** 2).mean())
                n += 1
                for m in self.metrics:
                    if not getattr(m, "basis_metric", False):
                        m.update(pred[None], gt[None])
            if save_images:
                self._save_image(
                    os.path.join(self.workspace, "validation",
                                 f"{self.name}_ep{self.epoch:04d}_{i:04d}.png"),
                    pred,
                )
        result = self.metrics[0].measure() if n else 0.0
        for m in self.metrics:
            m.write(self.writer, self.global_step, prefix="evaluate")
        self.stats["results"].append(result)
        if self.stats["best_result"] is None or result > self.stats["best_result"]:
            self.stats["best_result"] = result
        self.log(f"[eval epoch {self.epoch}] loss={total_loss/max(n,1):.6f} | "
                 + " | ".join(m.report() for m in self.metrics))
        return result

    def test(self, test_ds, save_path=None, name=None, write_video: bool = True):
        """Render the test split; save pngs and (optionally) an mp4 (nerf/utils.py:689-742)."""
        save_path = save_path or os.path.join(self.workspace, "results")
        name = name or f"{self.name}_ep{self.epoch:04d}"
        os.makedirs(save_path, exist_ok=True)
        frames, depths = [], []
        t0 = time.time()
        for i, data in enumerate(test_ds.iter_epoch()):
            out = self.eval_step_full(data)
            frames.append((np.clip(out["image"], 0, 1) * 255).astype(np.uint8))
            d = out["depth"]
            depths.append((np.clip(d, 0, 1) * 255).astype(np.uint8))
            self._save_image(os.path.join(save_path, f"{name}_{i:04d}_rgb.png"), out["image"])
        dt = time.time() - t0
        self.log(f"[test] {len(frames)} frames, total {dt:.2f}s, avg {dt/max(len(frames),1):.3f}s/frame")
        if write_video and frames:
            self._write_video(os.path.join(save_path, f"{name}_rgb.mp4"), frames)
            self._write_video(os.path.join(save_path, f"{name}_depth.mp4"),
                              [np.repeat(d[..., None], 3, -1) for d in depths])
        return frames

    def _write_video(self, path: str, frames, fps: int = 25):
        """mp4 via cv2 (no ffmpeg binary in minimal envs), imageio fallback."""
        try:
            import cv2

            h, w = frames[0].shape[:2]
            vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
            if vw.isOpened():
                for f in frames:
                    vw.write(cv2.cvtColor(np.ascontiguousarray(f), cv2.COLOR_RGB2BGR))
                vw.release()
                return
        except Exception:
            pass
        try:
            import imageio

            imageio.mimwrite(path, np.stack(frames), fps=fps, quality=8, macro_block_size=1)
        except Exception as e:
            self.log(f"[WARN] video write failed: {e}")

    def train_gui(self, train_ds, step: int = 16):
        """One interactive training burst of ``step`` optimizer steps
        (reference nerf/utils.py:745-800 train_gui). Returns dict(loss, lr)."""
        t0 = time.time()
        total = 0.0
        it = train_ds.iter_epoch()
        for _ in range(step):
            try:
                data = next(it)
            except StopIteration:
                it = train_ds.iter_epoch()
                data = next(it)
            if (not self.grid_frozen
                    and self.global_step % self.opt.update_extra_interval == 0):
                self.key, k = jax.random.split(self.key)
                self.grid_state = self._refresh_grid(k)
            self.key, k = jax.random.split(self.key)
            total += self._gui_train_step(data, k)
            self.global_step += 1
        lr = float(self.opt.lr * 0.1 ** min(self.global_step / self.opt.iters, 1.0))
        return {"loss": total / step, "lr": lr, "time": time.time() - t0}

    def _gui_train_step(self, data, key) -> float:
        """One optimizer step from a collated batch (overridden by PaletteTrainer,
        whose jitted step takes the palette loss arguments)."""
        out = self._train_step(
            self.params, self.opt_state, self.ema_params, self.grid_state.bitfield,
            key, jnp.asarray(data["rays_o"]), jnp.asarray(data["rays_d"]),
            jnp.asarray(data["images"]),
        )
        self.params, self.opt_state, self.ema_params = out[0], out[1], out[2]
        return float(out[3])

    def test_gui(self, pose, intrinsics, W: int, H: int, downscale: float = 1.0,
                 bg_color=None):
        """Render one interactive frame at (optionally downscaled) resolution
        (reference nerf/utils.py:803-858 test_gui). Returns dict(image, depth)."""
        from ..data.rays import gen_rays

        rW, rH = int(W * downscale), int(H * downscale)
        intr = np.asarray(intrinsics, np.float64) * downscale
        ro, rd = gen_rays(np.asarray(pose, np.float32), intr, rH, rW, None)
        out = self.render_image(ro, rd, bg_color)
        return {k: v.reshape(rH, rW, *v.shape[1:]) for k, v in out.items()}

    def _march_groups(self, num_samples: int, exact: bool = False) -> int:
        """Group-slot budget for the hierarchical occupancy march. 0 disables
        (flat per-candidate tests); the default (-1) resolves to 0 everywhere.

        The hierarchical march is strictly opt-in (``--march_groups > 0``):
        when more dilated supercell groups pass the coarse test than there are
        slots, valid samples the flat path would retain are silently dropped.
        On the acceptance scene (large occupied ground plane) a default-on
        train run diverged — loss bottomed at 0.017 by epoch 6 and rose to
        0.03+ as the sample drops fed back through the occupancy grid
        (round-4 on-chip finding). ``exact`` is kept in the signature so a
        future auto mode can again distinguish metric paths."""
        del exact, num_samples
        mg = getattr(self.opt, "march_groups", -1)
        return max(0, mg)

    def _compaction_rounds(self, s_inf: int) -> tuple:
        """Static alive-ray compaction schedule for an eval budget of ``s_inf``
        samples/ray (the reference's inference loop, nerf/renderer.py:336-386):
        all rays march s/4 samples, the top 1/4 by remaining transmittance
        continue s/4 more, the top 1/16 finish."""
        if getattr(self.opt, "eval_compaction", True) and s_inf % 4 == 0 and s_inf >= 16:
            return ((1, s_inf // 4), (4, s_inf // 4), (16, s_inf // 2))
        return ()

    def set_render_option(self, **kw):
        """Live render-settings update from GUI sliders (reference nerf/gui.py
        dt_gamma/max_steps sliders). Rebuilds the jitted fns — each new value
        combination compiles once, then hits the cache."""
        import dataclasses

        tkw = {k: v for k, v in kw.items() if k != "compaction_rounds"}
        if "num_samples" in kw and "march_groups" not in kw:
            # re-provision the hierarchical-march group budget for the new
            # sample count (otherwise raising samples via the GUI slider
            # under-provisions group slots and silently drops samples)
            tkw = dict(tkw, march_groups=self._march_groups(kw["num_samples"]))
            kw = dict(kw, march_groups=self._march_groups(kw["num_samples"],
                                                          exact=True))
        self.train_settings = dataclasses.replace(self.train_settings, **tkw)
        if "num_samples" in kw and "compaction_rounds" not in kw:
            # keep the eval compaction schedule consistent with the new sample
            # budget (the GUI 'max samples' slider was a no-op otherwise)
            kw = dict(kw, compaction_rounds=self._compaction_rounds(kw["num_samples"]))
        self.eval_settings = dataclasses.replace(self.eval_settings, **kw)
        self._build_jit_fns()

    def save_view(self, pose, intrinsics, W: int, H: int, name: Optional[str] = None):
        """Render and save the current GUI viewpoint (palette/gui.py:387-399
        'render view' button). Returns the saved path."""
        out = self.test_gui(pose, intrinsics, W, H)
        save_path = os.path.join(self.workspace, "results")
        os.makedirs(save_path, exist_ok=True)
        path = os.path.join(
            save_path, f"{name or self.name}_view_{int(time.time())}.png")
        self._save_image(path, np.asarray(out["image"]))
        self.log(f"[GUI] saved view {path}")
        return path

    def save_mesh(self, resolution: int = 256, threshold: float = 10.0,
                  save_path: Optional[str] = None):
        """Marching-tetrahedra mesh export of the density field
        (nerf/utils.py:633-653 save_mesh + :187-217 extract_geometry)."""
        from ..utils.mcubes import marching_tetrahedra, write_ply

        if hasattr(self, "palette_spec"):
            from ..models.palette import palette_density as nerf_density
        else:
            from ..models.nerf import nerf_density

        save_path = save_path or os.path.join(
            self.workspace, "meshes", f"{self.name}_{self.epoch}.ply")
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        b = self.spec.bound
        lin = np.linspace(-b, b, resolution, dtype=np.float32)
        field = np.zeros((resolution,) * 3, np.float32)
        params = self.eval_params()

        density_fn = jax.jit(lambda p, pts: nerf_density(p, self.spec, pts)["sigma"])
        chunk = 128 ** 2
        grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
        out = np.zeros(len(grid), np.float32)
        for s in range(0, len(grid), chunk):
            pts = grid[s:s + chunk]
            pad = chunk - len(pts)
            if pad:
                pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
            sig = np.asarray(density_fn(params, jnp.asarray(pts)))
            out[s:s + chunk - pad if pad else s + chunk] = sig[: chunk - pad if pad else chunk]
        field = out.reshape(resolution, resolution, resolution)

        verts, faces = marching_tetrahedra(field, threshold)
        verts = verts / (resolution - 1) * (2 * b) - b
        write_ply(save_path, verts, faces)
        self.log(f"[save_mesh] {len(verts)} verts, {len(faces)} faces -> {save_path}")
        return save_path

    def _save_image(self, path, img01):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            import cv2

            arr = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
            if arr.ndim == 3 and arr.shape[-1] == 3:
                arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
            cv2.imwrite(path, arr)
        except Exception as e:
            self.log(f"[WARN] image write failed: {e}")

    # ------------------------------------------------------------------ checkpoints

    def _ckpt_state(self):
        # full training state (reference full=True, nerf/utils.py:1090-1102): the
        # optimizer moments + step count and the PRNG key make resume bit-continuous
        return {
            "ema_params": self.ema_params,
            "grid_state": self.grid_state._asdict(),
            "stats": self.stats,
            "opt_state": self.opt_state,
            "prng_key": np.asarray(self.key),
        }

    def save_checkpoint(self, best: bool = False):
        if best:
            # best ckpt stores EMA weights and drops the density grid (nerf/utils.py:1134-1136)
            state = {"stats": self.stats}
            ckpt_lib.save_checkpoint(
                self.ckpt_path, self.name, self.epoch, self.global_step,
                self.eval_params(), state, self.max_keep_ckpt, best=True,
            )
        else:
            ckpt_lib.save_checkpoint(
                self.ckpt_path, self.name, self.epoch, self.global_step,
                self.params, self._ckpt_state(), self.max_keep_ckpt, best=False,
            )

    def load_checkpoint(self, path: Optional[str] = None, model_only: bool = False):
        if path is None:
            path = ckpt_lib.latest_checkpoint(self.ckpt_path, self.name)
            if path is None:
                self.log("[INFO] no checkpoint found, starting fresh")
                return
        data = ckpt_lib.load_checkpoint(path)
        self._fine_bitfield = None  # params/grid change below; rebake on next eval
        merged, missing, _ = ckpt_lib.merge_params_non_strict(self.params, data["params"])
        adopted = []
        if isinstance(merged, dict):
            # adopt state-only tensors absent from the fresh template (e.g. the frozen
            # hist_weights volume created by initialize_palette before training)
            for k, v in data["params"].items():
                if k not in merged:
                    merged[k] = v
                    adopted.append(k)
        self.params = jax.tree_util.tree_map(jnp.asarray, merged)
        if adopted:
            # the fresh opt/ema templates were built before the adoption; re-init
            # the optimizer on the full tree so the ckpt opt_state's structure
            # compare below sees matching leaves (palette resume: hist_weights)
            self.opt_state = self.tx.init(self.params)
        if missing:
            self.log(f"[WARN] missing params in ckpt: {missing[:5]}...")
        if model_only:
            self.log(f"[INFO] loaded model from {path}")
            return
        self.epoch = data.get("epoch", 0)
        self.global_step = data.get("global_step", 0)
        self.stats = data.get("stats", self.stats)
        if "ema_params" in data:
            merged, _, _ = ckpt_lib.merge_params_non_strict(self.ema_params, data["ema_params"])
            if isinstance(merged, dict):
                for k, v in data["ema_params"].items():
                    if k not in merged:
                        merged[k] = v
            self.ema_params = jax.tree_util.tree_map(jnp.asarray, merged)
        else:
            self.ema_params = jax.tree_util.tree_map(jnp.array, self.params)
        if "grid_state" in data:
            gs = data["grid_state"]
            self.grid_state = GridState(
                jnp.asarray(gs["density_grid"]), jnp.asarray(gs["bitfield"]),
                jnp.asarray(gs["mean_density"]), jnp.asarray(gs["iter_density"]),
            )
        if "opt_state" in data:
            try:
                fresh_leaves = jax.tree_util.tree_leaves(self.opt_state)
                saved_leaves = jax.tree_util.tree_leaves(data["opt_state"])
                ok = len(fresh_leaves) == len(saved_leaves) and all(
                    getattr(a, "shape", ()) == getattr(b, "shape", ())
                    for a, b in zip(fresh_leaves, saved_leaves))
                if ok:
                    self.opt_state = jax.tree_util.tree_map(
                        jnp.asarray, data["opt_state"])
                else:
                    self.log("[WARN] checkpoint optimizer state shape mismatch — "
                             "restarting Adam moments")
            except Exception as e:
                self.log(f"[WARN] optimizer state restore failed ({e}) — "
                         "restarting Adam moments")
        if "prng_key" in data:
            self.key = jnp.asarray(data["prng_key"])
        self.log(f"[INFO] loaded checkpoint {path} (epoch {self.epoch}, step {self.global_step})")


def spec_cascade(spec: NeRFSpec) -> int:
    import math

    return 1 + max(0, math.ceil(math.log2(spec.bound)))
