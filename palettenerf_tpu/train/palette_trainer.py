"""PaletteNeRF trainer (stage 3) + palette extraction driver (stage 2).

Re-design of the reference ``PaletteTrainer`` (``palette/utils.py:296-1331``):
- warm-starts sigma/color/bg nets + density grid from the stage-1 NeRF checkpoint by
  param-name intersection (:429-432, :1306-1330); the density grid stays FROZEN during
  palette training (grid-update calls commented out in the reference, :644-646).
- 8-term loss (:486-571): MSE(image) + MSE(direct_rgb) [+ MSE(clip_feat)]
  + lambda_sparsity*omega_sparsity + lambda_offsets*|offsets|^2
  + lambda_view_dep*|view_dep|^2 + lambda_smooth*smooth + lambda_patchsmooth*patch
  + lambda_palette*|basis_color - origin|^2 + lambda_weight*MSE(basis_acc, gt_weights).
- epoch schedules (:651-674): lambda_weight linear decay to 0 by lweight_decay_epoch;
  basis colors unfrozen + lambda_palette enabled after max_freeze_palette_epoch;
  smooth loss after smooth_loss_start_epoch.
- ``extract_palette`` (:1135-1200): render all training views with the *NeRF* model,
  keep foreground pixels (weights_sum > 0.5), intensity-normalize GT colors
  ((rgb+0.05)/|.|), run the RGBXY extraction -> palette.npz / hist_weights.npz.

Graph-changing schedule flags (freeze_basis_color, require_smooth_loss) are static jit
args — at most 4 recompiles over a training run.
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
from ..models.palette import (
    PaletteSpec,
    get_palette_weight_with_hist,
    init_palette,
    initialize_palette,
    palette_density,
)
from ..ops.occupancy import GridState, init_grid_state
from ..render.nerf_renderer import RenderSettings
from ..render.palette_renderer import (
    RegionEdit,
    StylizerParams,
    render_palette_eval,
    render_palette_train,
)
from ..utils.color import srgb_to_linear
from . import checkpoint as ckpt_lib
from .metrics import PSNRMeter
from .trainer import Trainer


class PaletteTrainer(Trainer):
    def __init__(
        self,
        name: str,
        opt: Config,
        spec: PaletteSpec,
        params=None,
        workspace: str = "workspace",
        metrics=None,
        use_checkpoint: str = "latest",
        nerf_path: Optional[str] = None,
        ema_decay: Optional[float] = 0.95,
        eval_interval: int = 50,
        max_keep_ckpt: int = 2,
        mute: bool = False,
    ):
        self.palette_spec = spec
        self.freeze_basis_color = opt.use_initialization_from_rgbxy
        self.require_smooth_loss = False
        self.lambda_palette = 0.0
        self.lambda_weight = opt.lambda_weight
        self.edit: Optional[RegionEdit] = None
        self.stylizer: Optional[StylizerParams] = None
        self.offsets_weight = 1.0
        self.view_dep_weight = 1.0

        if params is None:
            key = jax.random.PRNGKey(opt.seed)
            params = init_palette(key, spec)

        super().__init__(
            name, opt, spec, params=params, workspace=workspace, metrics=metrics,
            use_checkpoint=use_checkpoint, ema_decay=ema_decay,
            eval_interval=eval_interval, max_keep_ckpt=max_keep_ckpt, mute=mute,
        )
        self.grid_frozen = True  # inherited from the NeRF ckpt; never refreshed

        # warm-start from stage-1 only on fresh runs — resuming a palette checkpoint
        # must not stomp the palette-trained color head with stage-1 weights
        if nerf_path is not None and self.global_step == 0:
            self.load_nerf_checkpoint(nerf_path)

    # ------------------------------------------------------------------ jit fns

    def _build_jit_fns(self):
        spec = self.palette_spec
        opt = self.opt
        tset = self.train_settings
        eset = self.eval_settings
        decay = self.ema_decay

        def patch_smooth_term(out, inds, width):
            """Paired-pixel omega smoothness (palette/utils.py:494-516): rays come in
            (pixel, jittered-pixel) pairs from the random_size sampler; penalize omega
            differences weighted by image-space distance and diffuse similarity."""
            n = inds.shape[0]
            half = n // 2
            diffuse = out["diffuse_rgb"]
            omega = out["basis_acc"]
            ij = jnp.stack([inds // width, inds % width], -1).astype(jnp.float32)
            d0, d1 = diffuse[:half], diffuse[half:]
            o0, o1 = omega[:half], omega[half:]
            p0, p1 = ij[:half], ij[half:]
            xyz_w = ((p0 - p1) ** 2).sum(-1, keepdims=True) / 100.0
            rgb_w = ((d0 - d1) ** 2).sum(-1, keepdims=True) / opt.sigma_color
            sw = jax.lax.stop_gradient(jnp.exp(-(xyz_w + rgb_w)))
            return (((o0 - o1) ** 2).sum(-1, keepdims=True) * sw).mean()

        from ..parallel.mesh import shard_rays
        mesh = self.mesh

        def train_step(params, opt_state, ema, bitfield, key, rays_o, rays_d,
                       images, gt_feat, inds, lambda_weight, lambda_palette,
                       width, freeze_basis_color, require_smooth_loss):
            # ``width`` is a traced scalar: baking it in at trace time (the old
            # Python-attribute approach) silently reused a stale W after a
            # dataset swap — the same latent-bug class as the reference's
            # opt.sigma_color (palette/utils.py:511)
            # freeze/smooth are static bools via partial-jit below
            k_bg, k_render = jax.random.split(key)
            rays_o, rays_d, images = shard_rays(mesh, rays_o, rays_d, images)
            c = images.shape[-1]
            img = images
            if opt.color_space == "linear":
                img = img.at[..., :3].set(srgb_to_linear(img[..., :3]))
            if c == 4 and spec.bg_radius <= 0:
                bg = jax.random.uniform(k_bg, (img.shape[0], 3))
                gt = img[..., :3] * img[..., 3:] + bg * (1.0 - img[..., 3:])
            else:
                bg = jnp.ones((3,), jnp.float32)
                gt = img[..., :3]

            def loss_fn(p):
                out = render_palette_train(
                    p, spec, bitfield, rays_o, rays_d, k_render, tset,
                    bg_color=bg, freeze_basis_color=freeze_basis_color,
                    require_smooth_loss=require_smooth_loss, perturb=True,
                )
                per_ray = ((out["image"] - gt) ** 2).mean(-1)
                loss = per_ray.mean()
                loss += ((out["direct_rgb"] - gt) ** 2).mean()
                if spec.pred_clip:
                    loss += ((out["clip_feat"] - gt_feat) ** 2).mean()
                loss += opt.lambda_sparsity * out["omega_sparsity"].mean()
                loss += opt.lambda_offsets * out["offsets_norm"].mean()
                loss += opt.lambda_view_dep * out["view_dep_norm"].mean()
                if require_smooth_loss and opt.lambda_smooth > 0:
                    loss += opt.lambda_smooth * out["smooth_norm"].mean()
                if (require_smooth_loss and opt.random_size > 0
                        and opt.lambda_patchsmooth > 0):
                    loss += opt.lambda_patchsmooth * patch_smooth_term(
                        out, inds, width)
                loss += lambda_palette * (
                    (p["basis_color"] - p["basis_color_origin"]) ** 2
                ).sum(-1).mean()
                if "hist_weights" in p:
                    gt_w = jax.lax.stop_gradient(
                        get_palette_weight_with_hist(gt, p["hist_weights"])
                    )
                    loss += lambda_weight * ((gt_w - out["basis_acc"]) ** 2).mean()
                return loss, per_ray

            (loss, per_ray), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            # frozen leaves: origin + hist volume never update
            grads["basis_color_origin"] = jnp.zeros_like(grads["basis_color_origin"])
            if "hist_weights" in grads:  # frozen buffer (renderer.py:268)
                grads["hist_weights"] = jnp.zeros_like(grads["hist_weights"])
            updates, opt_state = self.tx.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            if decay is not None:
                ema = jax.tree_util.tree_map(
                    lambda e, p: e * decay + p * (1.0 - decay), ema, params
                )
            return params, opt_state, ema, loss, per_ray

        self._train_step = jax.jit(
            train_step, static_argnums=(13, 14), donate_argnums=(0, 1, 2)
        )

        # ---- scanned fast path: K steps per dispatch, pixels sampled on device
        def scan_steps(params, opt_state, ema, bitfield, key, images, feats, poses,
                       img_idx, lambda_weight, lambda_palette, intrinsics, H, W,
                       freeze_basis_color, require_smooth_loss):
            import optax

            from ..data.rays_device import gen_rays_jnp

            c = images.shape[-1]

            def body(carry, idx):
                params, opt_state, ema, key = carry
                key, k_pix, k_bg, k_render = jax.random.split(key, 4)
                inds = jax.random.randint(k_pix, (opt.num_rays,), 0, H * W)
                pix = images[idx][inds]
                if opt.color_space == "linear":
                    pix = pix.at[..., :3].set(srgb_to_linear(pix[..., :3]))
                if c == 4 and spec.bg_radius <= 0:
                    bg = jax.random.uniform(k_bg, (opt.num_rays, 3))
                    gt = pix[..., :3] * pix[..., 3:] + bg * (1.0 - pix[..., 3:])
                else:
                    bg = jnp.ones((3,), jnp.float32)
                    gt = pix[..., :3]
                gt_feat = feats[idx][inds] if feats is not None else None
                rays_o, rays_d = gen_rays_jnp(poses[idx], intrinsics, H, W, inds)
                rays_o, rays_d, gt = shard_rays(mesh, rays_o, rays_d, gt)

                def loss_fn(p):
                    out = render_palette_train(
                        p, spec, bitfield, rays_o, rays_d, k_render, tset,
                        bg_color=bg, freeze_basis_color=freeze_basis_color,
                        require_smooth_loss=require_smooth_loss, perturb=True,
                    )
                    loss = ((out["image"] - gt) ** 2).mean()
                    loss += ((out["direct_rgb"] - gt) ** 2).mean()
                    if spec.pred_clip and gt_feat is not None:
                        loss += ((out["clip_feat"] - gt_feat) ** 2).mean()
                    loss += opt.lambda_sparsity * out["omega_sparsity"].mean()
                    loss += opt.lambda_offsets * out["offsets_norm"].mean()
                    loss += opt.lambda_view_dep * out["view_dep_norm"].mean()
                    if require_smooth_loss and opt.lambda_smooth > 0:
                        loss += opt.lambda_smooth * out["smooth_norm"].mean()
                    loss += lambda_palette * (
                        (p["basis_color"] - p["basis_color_origin"]) ** 2
                    ).sum(-1).mean()
                    if "hist_weights" in p:
                        gt_w = jax.lax.stop_gradient(
                            get_palette_weight_with_hist(gt, p["hist_weights"]))
                        loss += lambda_weight * ((gt_w - out["basis_acc"]) ** 2).mean()
                    return loss

                loss, grads = jax.value_and_grad(loss_fn)(params)
                grads["basis_color_origin"] = jnp.zeros_like(grads["basis_color_origin"])
                if "hist_weights" in grads:
                    grads["hist_weights"] = jnp.zeros_like(grads["hist_weights"])
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                if decay is not None:
                    ema = jax.tree_util.tree_map(
                        lambda e, p: e * decay + p * (1.0 - decay), ema, params)
                return (params, opt_state, ema, key), loss

            (params, opt_state, ema, key), losses = jax.lax.scan(
                body, (params, opt_state, ema, key), img_idx)
            return params, opt_state, ema, losses

        self._scan_steps_palette = jax.jit(
            scan_steps, static_argnums=(12, 13, 14, 15), donate_argnums=(0, 1, 2)
        )

        def eval_chunk(params, bitfield, rays_o, rays_d, bg_color):
            from ..parallel.mesh import shard_rays
            rays_o, rays_d = shard_rays(self.mesh, rays_o, rays_d)
            return render_palette_eval(
                params, spec, bitfield, rays_o, rays_d, eset, bg_color,
                edit=self.edit, stylizer=self.stylizer,
                offsets_weight=self.offsets_weight, view_dep_weight=self.view_dep_weight,
            )

        # note: edit state is baked per-jit; changing self.edit retriggers compile of
        # this closure — acceptable for headless editing, the GUI path pre-compiles.
        self._eval_chunk = jax.jit(eval_chunk)

        def density_fn(params, pts):
            chunks = pts.reshape(64, -1, 3)
            return jax.lax.map(
                lambda c: palette_density(params, spec, c)["sigma"], chunks
            ).reshape(-1)

        from ..ops.occupancy import mark_untrained_grid, update_density_grid

        def update_grid(params, grid_state, key):
            return update_density_grid(
                grid_state, partial(density_fn, params), key,
                bound=spec.bound, density_thresh=opt.density_thresh,
                grid_size=opt.grid_size,
            )

        self._update_grid = jax.jit(update_grid, donate_argnums=(1,))

        def mark(grid_state, poses, intrinsics):
            return mark_untrained_grid(
                grid_state, poses, intrinsics, spec.bound, opt.min_near,
                opt.filter_close_point, opt.grid_size,
            )

        self._mark_untrained = jax.jit(mark, static_argnums=(2,))

    def _field_density(self, params, pts):
        from ..models.palette import palette_density

        return palette_density(params, self.palette_spec, pts)["sigma"]

    def set_edit(self, edit: Optional[RegionEdit] = None,
                 stylizer: Optional[StylizerParams] = None,
                 offsets_weight: float = 1.0, view_dep_weight: float = 1.0):
        """Headless editing API: set render-time edit state (GUI hooks call this)."""
        self.edit = edit
        self.stylizer = stylizer
        self.offsets_weight = offsets_weight
        self.view_dep_weight = view_dep_weight
        # re-bind the jitted eval closure to the new edit state
        spec, eset = self.palette_spec, self.eval_settings

        def eval_chunk(params, bitfield, rays_o, rays_d, bg_color):
            from ..parallel.mesh import shard_rays
            rays_o, rays_d = shard_rays(self.mesh, rays_o, rays_d)
            return render_palette_eval(
                params, spec, bitfield, rays_o, rays_d, eset, bg_color,
                edit=self.edit, stylizer=self.stylizer,
                offsets_weight=self.offsets_weight, view_dep_weight=self.view_dep_weight,
            )

        self._eval_chunk = jax.jit(eval_chunk)

    # ------------------------------------------------------------------ training

    def initialize_palette(self, color_list=None, hist_weights=None):
        self.params = initialize_palette(self.params, self.palette_spec, color_list, hist_weights)
        self.ema_params = jax.tree_util.tree_map(jnp.array, self.params)
        self._fine_bitfield = None
        self.opt_state = self.tx.init(self.params)

    def train(self, train_ds, valid_ds=None, max_epochs: int = 1):
        # density grid inherited frozen from the NeRF ckpt — NO update_extra_state
        # and NO mark_untrained (palette/utils.py:644-646, renderer has neither)
        opt = self.opt
        # resume: re-derive the epoch-schedule state the end-of-epoch updates
        # below would have left (a resumed epoch-55 run must not train one
        # epoch with the pre-epoch-30 smooth-off graph)
        if self.epoch >= opt.max_freeze_palette_epoch or not opt.use_initialization_from_rgbxy:
            self.freeze_basis_color = False
            self.lambda_palette = opt.lambda_palette
        if self.epoch >= opt.smooth_loss_start_epoch:
            self.require_smooth_loss = True
        for _ in range(max_epochs - self.epoch):
            self.epoch += 1
            self.lambda_weight = opt.lambda_weight * max(0.0, 1.0 - self.epoch / opt.lweight_decay_epoch)
            self.train_one_epoch(train_ds)
            # amortized rolling saves (the 600 MB palette state costs ~40 s
            # per save through the tunnel — per-epoch saves added ~45% wall
            # time to the round-5 product training run)
            if self.epoch % self._ckpt_every() == 0 or self.epoch == max_epochs:
                self.save_checkpoint(best=False)
            if valid_ds is not None and self.epoch % self.eval_interval == 0:
                self.evaluate_one_epoch(valid_ds)
                self.save_checkpoint(best=True)
            if self.epoch >= opt.max_freeze_palette_epoch or not opt.use_initialization_from_rgbxy:
                self.freeze_basis_color = False
                self.lambda_palette = opt.lambda_palette
            if self.epoch >= opt.smooth_loss_start_epoch:
                self.require_smooth_loss = True
        return self.stats

    def supports_fast_path(self, train_ds) -> bool:
        opt = self.opt
        return (
            train_ds.images is not None
            and not opt.error_map
            and opt.patch_size == 1
            and getattr(opt, "random_size", 0) == 0
        )

    def train_one_epoch_fast(self, train_ds):
        """Scanned palette epoch: one dispatch per update_extra_interval steps."""
        t0 = time.time()
        if not hasattr(self, "_dev_images"):
            imgs = train_ds.images
            self._dev_images = jnp.asarray(imgs.reshape(imgs.shape[0], -1, imgs.shape[-1]))
            self._dev_poses = jnp.asarray(train_ds.poses)
            feats = getattr(train_ds, "feat_images", None)
            self._dev_feats = (
                jnp.asarray(feats.reshape(feats.shape[0], -1, feats.shape[-1]))
                if feats is not None else None
            )
        B = len(train_ds.poses)
        order = np.random.permutation(B)
        interval = self.opt.update_extra_interval
        intr = tuple(float(v) for v in train_ds.intrinsics)
        losses = []
        for start in range(0, B, interval):
            chunk = order[start:start + interval]
            self.key, k = jax.random.split(self.key)
            (self.params, self.opt_state, self.ema_params, ls) = self._scan_steps_palette(
                self.params, self.opt_state, self.ema_params, self.grid_state.bitfield,
                k, self._dev_images, self._dev_feats, self._dev_poses,
                jnp.asarray(chunk), jnp.float32(self.lambda_weight),
                jnp.float32(self.lambda_palette), intr, train_ds.H, train_ds.W,
                self.freeze_basis_color, self.require_smooth_loss,
            )
            self.global_step += len(chunk)
            losses.append(ls)
        avg = float(jnp.concatenate(losses).mean())
        self.stats["loss"].append(avg)
        self._write_scalar("train/loss", avg)
        self.log(f"[epoch {self.epoch}] loss={avg:.6f} "
                 f"({B} steps, {time.time()-t0:.1f}s, step={self.global_step}, "
                 f"lw={self.lambda_weight:.4f}, lp={self.lambda_palette:.4f}, "
                 f"freeze={self.freeze_basis_color}, smooth={self.require_smooth_loss})")

    def _gui_train_step(self, data, key) -> float:
        """Palette-loss GUI step (train_gui) — the base signature lacks the
        palette terms (gt_feat/inds/lambdas/schedule flags)."""
        clip_dim = self.palette_spec.clip_dim
        images = jnp.asarray(data["images"])
        gt_feat = jnp.asarray(
            data.get("feat_images", np.zeros((images.shape[0], clip_dim), np.float32)))
        inds = jnp.asarray(data.get("inds", np.zeros(images.shape[0], np.int64)))
        (self.params, self.opt_state, self.ema_params, loss, _per_ray) = self._train_step(
            self.params, self.opt_state, self.ema_params, self.grid_state.bitfield,
            key, jnp.asarray(data["rays_o"]), jnp.asarray(data["rays_d"]),
            images, gt_feat, inds,
            jnp.float32(self.lambda_weight), jnp.float32(self.lambda_palette),
            jnp.int32(data["W"]), self.freeze_basis_color, self.require_smooth_loss,
        )
        return float(loss)

    def train_one_epoch(self, train_ds):
        if self.supports_fast_path(train_ds):
            return self.train_one_epoch_fast(train_ds)
        t0 = time.time()
        total_loss, steps = 0.0, 0
        clip_dim = self.palette_spec.clip_dim
        for data in train_ds.iter_epoch():
            self.key, k = jax.random.split(self.key)
            images = jnp.asarray(data["images"])
            gt_feat = jnp.asarray(
                data.get("feat_images", np.zeros((images.shape[0], clip_dim), np.float32))
            )
            inds = jnp.asarray(data.get("inds", np.zeros(images.shape[0], np.int64)))
            (self.params, self.opt_state, self.ema_params, loss, per_ray) = self._train_step(
                self.params, self.opt_state, self.ema_params, self.grid_state.bitfield,
                k, jnp.asarray(data["rays_o"]), jnp.asarray(data["rays_d"]),
                images, gt_feat, inds,
                jnp.float32(self.lambda_weight), jnp.float32(self.lambda_palette),
                jnp.int32(data["W"]), self.freeze_basis_color, self.require_smooth_loss,
            )
            self.global_step += 1
            steps += 1
            total_loss += float(loss)
            if "inds_coarse" in data:
                train_ds.update_error_map(data["index"], data["inds_coarse"], np.asarray(per_ray))
        avg = total_loss / max(steps, 1)
        self.stats["loss"].append(avg)
        self.log(f"[epoch {self.epoch}] loss={avg:.6f} "
                 f"({steps} steps, {time.time()-t0:.1f}s, step={self.global_step}, "
                 f"lw={self.lambda_weight:.4f}, lp={self.lambda_palette:.4f}, "
                 f"freeze={self.freeze_basis_color}, smooth={self.require_smooth_loss})")

    # ------------------------------------------------------------------ eval / test

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
                    if getattr(m, "basis_metric", False):
                        m.update(out["basis_acc"], out["weights_sum"])
                    else:
                        m.update(pred[None], gt[None])
            if save_images:
                base = os.path.join(self.workspace, "validation",
                                    f"{self.name}_ep{self.epoch:04d}_{i:04d}")
                self._save_image(base + ".png", pred)
                self._save_palette_maps(base, out)
        result = self.metrics[0].measure() if n else 0.0
        for m in self.metrics:
            m.write(self.writer, self.global_step, prefix="evaluate")
        self.stats["results"].append(result)
        if self.stats["best_result"] is None or result > self.stats["best_result"]:
            self.stats["best_result"] = result
        self.log(f"[eval epoch {self.epoch}] loss={total_loss/max(n,1):.6f} | "
                 + " | ".join(m.report() for m in self.metrics))
        return result

    def _save_palette_maps(self, base: str, out: dict):
        """Per-basis decomposition maps + PCA clip features (palette/utils.py:833-909)."""
        P = self.palette_spec.num_basis
        if "basis_rgb" in out:
            H, W = out["image"].shape[:2]
            for p in range(P):
                self._save_image(base + f"_basis{p:02d}_rgb.png",
                                 out["basis_rgb"].reshape(H, W, P, 3)[..., p, :])
                self._save_image(base + f"_basis{p:02d}_acc.png",
                                 np.repeat(out["basis_acc"][..., p:p + 1], 3, -1))
        if "clip_feat" in out and self.palette_spec.pred_clip:
            cf = out["clip_feat"].reshape(-1, out["clip_feat"].shape[-1])
            cf = cf - cf.mean(0)
            u, s, vt = np.linalg.svd(cf, full_matrices=False)
            proj = (u[:, :3] * s[:3]).reshape(*out["image"].shape[:2], 3)
            proj = (proj - proj.min()) / (np.ptp(proj) + 1e-8)  # ndarray.ptp removed in NumPy 2.0
            self._save_image(base + "_clip_pca.png", proj)

    def test(self, test_ds, save_path=None, name=None, write_video: bool = True):
        """Test renders with per-basis decomposition videos (palette/utils.py:1050-1078)."""
        save_path = save_path or os.path.join(self.workspace, "results")
        name = name or f"{self.name}_ep{self.epoch:04d}"
        os.makedirs(save_path, exist_ok=True)
        P = self.palette_spec.num_basis
        frames, depths = [], []
        basis_frames = [[] for _ in range(P)]
        t0 = time.time()
        for i, data in enumerate(test_ds.iter_epoch()):
            out = self.eval_step_full(data)
            img8 = (np.clip(out["image"], 0, 1) * 255).astype(np.uint8)
            frames.append(img8)
            depths.append((np.clip(out["depth"], 0, 1) * 255).astype(np.uint8))
            self._save_image(os.path.join(save_path, f"{name}_{i:04d}_rgb.png"), out["image"])
            if "basis_rgb" in out:
                H, W = out["image"].shape[:2]
                br = out["basis_rgb"].reshape(H, W, P, 3)
                for p in range(P):
                    basis_frames[p].append((np.clip(br[..., p, :], 0, 1) * 255).astype(np.uint8))
        dt = time.time() - t0
        self.log(f"[test] {len(frames)} frames, total {dt:.2f}s, avg {dt/max(len(frames),1):.3f}s/frame")
        if write_video and frames:
            self._write_video(os.path.join(save_path, f"{name}_rgb.mp4"), frames)
            self._write_video(os.path.join(save_path, f"{name}_depth.mp4"),
                              [np.repeat(d[..., None], 3, -1) for d in depths])
            for p in range(P):
                if basis_frames[p]:
                    self._write_video(os.path.join(save_path, f"{name}_basis{p:02d}.mp4"),
                                      basis_frames[p])
        return frames

    # ------------------------------------------------------------------ extraction

    def extract_palette(self, nerf_trainer, loader, normalize_input: bool = False,
                        save_path: Optional[str] = None, via_sweep: bool = False,
                        sweep_resolution: int = 384, u_res: int = 448):
        """Stage-2: render all training views with the stage-1 NeRF and run RGBXY
        extraction (palette/utils.py:1135-1200). ``nerf_trainer`` provides the
        renderer; GT pixels come from the loader.

        ``via_sweep`` renders the views with the shear-warp sweep over a baked
        volume instead of the per-ray network path. The extraction statistics
        only consume the renders' foreground mask (weights_sum > 0.5) and
        depth-reconstructed xyz — both tolerant of bake-resolution error — while
        the COLORS come from the dataset GT either way, so at a fixed image
        resolution the palette matches the per-ray extraction (measured: bit-
        identical on the sphere scene, <=7e-4 per channel on proc_toys at
        downscale 2). NOTE the extraction statistics are NOT resolution-
        invariant (proc_toys at full res collapses to a different hull than at
        downscale 2 — a property of the RGBXY histogram itself, not of the
        render source), so compare like with like. One bake (~4 min at R=384
        on the tunneled chip) plus ~60 fps renders replace N_views exact
        frames: full-res 108-view extraction measured 7m36s end-to-end vs
        ~12 min for the per-ray path at QUARTER resolution."""
        from ..extraction.extract import palette_extraction

        save_path = save_path or self.workspace
        os.makedirs(save_path, exist_ok=True)
        sv = None
        if via_sweep:
            from ..render.baking import bake_nerf, mask_with_bitfield
            from ..render.sweep import (build_sweep_volume, plan_sweep,
                                        render_sweep)

            t0 = time.time()
            bparams = nerf_trainer.eval_params()
            baked = bake_nerf(bparams, nerf_trainer.spec,
                              resolution=sweep_resolution)
            gs = nerf_trainer.grid_state
            baked = mask_with_bitfield(
                baked, {"bitfield": np.asarray(gs.bitfield),
                        "density_grid": np.asarray(gs.density_grid)})
            sv = build_sweep_volume(baked)
            self.log(f"[extract_palette] sweep volume baked in "
                     f"{time.time() - t0:.1f}s (R={sweep_resolution})")
        all_norm, all_xyz = [], []
        n_fallback = 0
        for data in loader.iter_epoch():
            use_sweep = False
            if sv is not None:
                pose = loader.poses[data["index"]]
                plan = plan_sweep(np.asarray(pose), loader.intrinsics,
                                  data["H"], data["W"], sv.bound, u_res)
                # the shear-warp factorization needs the eye OUTSIDE the slice
                # slab along the chosen major axis; inside-volume cameras fall
                # back to the exact per-ray path for that view
                use_sweep = abs(float(plan.o_p[0])) > sv.bound * 1.02
            if use_sweep:
                out = render_sweep(sv, pose, loader.intrinsics,
                                   data["H"], data["W"], u_res=u_res,
                                   min_near=self.opt.min_near,
                                   t_thresh=self.opt.t_thresh_infer)
                out = {k: np.asarray(v) for k, v in out.items()}
            else:
                n_fallback += 1 if sv is not None else 0
                out = nerf_trainer.eval_step_full(data)
            H, W = data["H"], data["W"]
            gt = data["images"][..., :3].reshape(-1, 3)
            if data["images"].shape[-1] == 4:
                a = data["images"][..., 3:].reshape(-1, 1)
                gt = gt * a + 1.0 * (1 - a)
            if self.opt.color_space == "linear":
                gt = np.asarray(srgb_to_linear(jnp.asarray(gt)))
            w = out["weights_sum"].reshape(-1)
            depth_o = out.get("depth_origin", out["depth"]).reshape(-1, 1)
            xyz = data["rays_o"].reshape(-1, 3) + data["rays_d"].reshape(-1, 3) * depth_o

            norm = gt + 0.05
            norm = norm / np.linalg.norm(norm, axis=-1, keepdims=True)
            valid = w > 0.5
            all_norm.append(norm[valid])
            all_xyz.append(xyz[valid])
        colors = np.concatenate(all_norm, 0)
        xyzs = np.concatenate(all_xyz, 0)
        if sv is not None and n_fallback:
            self.log(f"[extract_palette] {n_fallback} inside-volume views used "
                     "the per-ray path")
        self.log(f"[extract_palette] {len(colors)} foreground samples")
        return palette_extraction(
            {"colors": colors, "xyzs": xyzs}, save_path,
            normalize_input=normalize_input, error_thres=self.opt.error_thres,
        )

    # ------------------------------------------------------------------ warm start

    def load_nerf_checkpoint(self, nerf_path: str):
        """Non-strict load of stage-1 weights + density grid (palette/utils.py:1306-1330)."""
        ckpt_dir = os.path.join(nerf_path, "checkpoints")
        path = ckpt_lib.latest_checkpoint(ckpt_dir, "ngp")
        assert path is not None, f"no NeRF checkpoint under {ckpt_dir}"
        data = ckpt_lib.load_checkpoint(path)
        self._fine_bitfield = None  # params/grid change below; rebake on next eval
        merged, missing, loaded = ckpt_lib.merge_params_non_strict(self.params, data["params"])
        self.params = jax.tree_util.tree_map(jnp.asarray, merged)
        self.ema_params = jax.tree_util.tree_map(jnp.array, self.params)
        self.opt_state = self.tx.init(self.params)
        self.log(f"[INFO] warm-started {len(loaded)} tensors from NeRF ckpt {path}; "
                 f"palette-only tensors: {len(missing)}")
        if "grid_state" in data:
            gs = data["grid_state"]
            self.grid_state = GridState(
                jnp.asarray(gs["density_grid"]), jnp.asarray(gs["bitfield"]),
                jnp.asarray(gs["mean_density"]), jnp.asarray(gs["iter_density"]),
            )
            self.log("[INFO] inherited frozen density grid from NeRF ckpt")
