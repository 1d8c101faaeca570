"""Joint appearance-embedding training, restructured TPU-first.

The reference buries the embedding net inside the Dataset with its own
optimizer that the training script steps blindly (kitti_mot.py:119-132,
train.py:136-137), and runs it one frame at a time.  Here the trainer owns
it: a chunk's frames are batched into one [T, H, W, 3] tensor, the jit'd
embed step runs backbone forward -> center gather -> FairMOT id loss ->
Adam update in a single XLA program, and the (stop-gradient) sampled
features flow into the tracker's vis branch - preserving the reference's
`features.detach()` contract (kitti_mot.py:568: tracker loss never
backprops into the backbone).

Recipe parity: espv2 -> Adam(5e-4, wd 5e-4), down_ratio 1; dla34 ->
Adam(1.25e-4), down_ratio 4 (kitti_mot.py:119-126).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from trackmpnn_tpu.losses.embedding import fairmot_id_loss
from trackmpnn_tpu.train.optim import _adam_l2

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_image(path: str, hflip: bool, input_hw: Tuple[int, int]) -> np.ndarray:
    """PIL load -> resize -> ImageNet-normalize -> HWC float32.  Unreadable
    images (frame-count placeholders in tests) become zeros."""
    h, w = input_hw
    try:
        import PIL.Image

        with PIL.Image.open(path) as im:
            if hflip:
                im = im.transpose(PIL.Image.FLIP_LEFT_RIGHT)
            im = im.convert("RGB").resize((w, h), PIL.Image.BILINEAR)
            arr = np.asarray(im, np.float32) / 255.0
    except Exception:
        arr = np.zeros((h, w, 3), np.float32)
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


class EmbedTrainer:
    """Owns backbone params + optimizer; runs batched embed steps."""

    def __init__(self, arch: str = "espv2", num_vis_feats: int = 128,
                 input_hw: Tuple[int, int] = (384, 1280), seed: int = 5,
                 max_dets: int = 256, train_bn: bool = False,
                 dcn_max_offset: float = None, frame_chunk="auto",
                 conv_dtype=None):
        self.arch = arch
        self.num_vis_feats = num_vis_feats
        self.input_hw = input_hw
        self.max_dets = max_dets  # fixed gather capacity (bounds recompiles)
        self.train_bn = train_bn
        # conv_dtype: contraction precision for every backbone conv/matmul
        # (backbones/layers.py conv_compute).  "bfloat16" feeds the MXU in
        # bf16 with f32 accumulation; params, BN and losses stay f32.
        if isinstance(conv_dtype, str):
            conv_dtype = None if conv_dtype in ("", "f32", "float32") \
                else jnp.dtype(conv_dtype).type
        self.conv_dtype = conv_dtype
        # frame_chunk: run the backbone over the chunk's frames `frame_chunk`
        # at a time via a checkpointed lax.map instead of one [T,...] batch.
        # The backward then recomputes per frame-chunk, so HBM peak is one
        # chunk's backbone temps + the assembled feature map — required for
        # the exact-gather DCN at KITTI shapes, whose unchunked joint
        # backward needs 65 GB of gather temps on a 16 GB chip (the loss
        # still couples all detections; numerics are unchanged).
        if frame_chunk == "auto":
            # round-3 whole-step measurement (tools/bench_embed_ab.py, v5e,
            # 384x1280): the dla34 exact-gather joint step does not fit HBM
            # unchunked (65 GB of backward gather temps) and frame_chunk=1
            # is its fastest fitting config; small inputs (CPU tests) skip
            # the chunk scan.  espv2 fits comfortably unchunked.
            frame_chunk = 1 if (arch == "dla34" and not train_bn
                                and input_hw[0] * input_hw[1] >= 192 * 640) \
                else None
        if frame_chunk is not None and train_bn:
            raise ValueError("frame_chunk is incompatible with train_bn "
                             "(batch statistics would be per-chunk)")
        self.frame_chunk = frame_chunk
        key = jax.random.key(seed)
        self._drop_key = jax.random.key(seed + 1)
        if arch == "espv2":
            from trackmpnn_tpu.backbones import espnetv2

            self.down_ratio = 1
            self.params = espnetv2.init_espnetv2_seg(key, classes=num_vis_feats)
            self._apply = lambda p, x, train, rng: espnetv2.apply_espnetv2_seg(
                p, x, train=train, drop_rng=rng)
            lr, wd = 5e-4, 5e-4
        elif arch == "dla34":
            from trackmpnn_tpu.backbones import dla

            self.down_ratio = 4
            heads = {"trk": num_vis_feats}
            # DCN default: the exact (bound-free) gather path, frame-chunked.
            # The shifted-warp alternative (dcn_max_offset=R clamps offsets
            # to +-R and rewrites sampling as (2R+2)^2 static shifts) wins
            # 1.8x PER LAYER at batch 1 (tools/bench_deform.py) but loses at
            # whole-network scale where its term-by-term image re-streaming
            # blows the cache: full joint step at KITTI shapes on v5e is
            # gather+chunk1 2467 ms vs shift R=2 3422 (chunked) / 4856
            # (unchunked); shift R=1 merely ties gather while clamping
            # offsets to +-1 px (tools/bench_embed_ab.py, docs/RESULTS.md).
            # The gather default is also what converted reference
            # checkpoints require (unbounded offsets).
            self.params = dla.init_dlaseg(key, heads)
            self._apply = lambda p, x, train, rng: dla.apply_dlaseg(
                p, x, heads, train=train, dcn_max_offset=dcn_max_offset)["trk"]
            lr, wd = 1.25e-4, 0.0
        else:
            raise ValueError(f"unknown embed arch {arch!r}")
        # BN running buffers live in the flat params dict for checkpoint/
        # converter simplicity, but they are torch *buffers*: the optimizer
        # must never touch them (weight decay would shrink them toward zero).
        buf_mask = {k: ".running_" not in k for k in self.params}
        self.tx = optax.inject_hyperparams(
            lambda learning_rate, weight_decay: optax.masked(
                _adam_l2(learning_rate, weight_decay), buf_mask)
        )(learning_rate=lr, weight_decay=wd)
        self.opt_state = self.tx.init(self.params)
        self._step = self._build_step()
        self._infer = self._build_infer()

    # NOTE on BN: by default backbone BatchNorms run on running statistics
    # even during training (frozen-BN fine-tuning from the pretrained
    # ImageNet stats).  train_bn=True switches to reference semantics
    # (ref kitti_mot.py:119-132 trains the net in .train() mode): batch
    # statistics normalize, and momentum-updated running buffers are
    # collected from the traced forward and folded back into params.

    def _build_step(self):
        apply = self._apply
        tx = self.tx
        C = self.num_vis_feats
        train_bn = self.train_bn
        fc = self.frame_chunk

        conv_dt = self.conv_dtype

        def backbone(p, images, rng):
            from trackmpnn_tpu.backbones.layers import conv_compute

            if fc is None:
                with conv_compute(conv_dt):
                    return apply(p, images, train_bn, rng)   # [T, Hm, Wm, C]
            T = images.shape[0]
            nc = -(-T // fc)
            pad = nc * fc - T
            xs = jnp.pad(images, ((0, pad),) + ((0, 0),) * 3)
            xs = xs.reshape(nc, fc, *images.shape[1:])

            def chunk(args):
                x, i = args
                r = jax.random.fold_in(rng, i) if rng is not None else None
                with conv_compute(conv_dt):
                    return apply(p, x, train_bn, r)

            fmap = jax.lax.map(jax.checkpoint(chunk), (xs, jnp.arange(nc)))
            return fmap.reshape(nc * fc, *fmap.shape[2:])[:T]

        @jax.jit
        def step(params, opt_state, images, fr_of, cy, cx, track_ids, valid, rng):
            def loss_fn(p):
                from trackmpnn_tpu.backbones.layers import collect_bn_updates

                with collect_bn_updates() as bn_new:
                    fmap = backbone(p, images, rng)          # [T, Hm, Wm, C]
                feats = fmap[fr_of, cy, cx]              # [Nmax, C]
                loss = fairmot_id_loss(feats, track_ids, valid, C)
                return loss, (feats, bn_new)

            (loss, (feats, bn_new)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
            if bn_new:  # fold momentum-updated running buffers back in
                params = {**params, **{k: jax.lax.stop_gradient(v)
                                       for k, v in bn_new.items()}}
            return params, opt_state, loss, jax.lax.stop_gradient(feats)

        return step

    def _build_infer(self):
        apply = self._apply

        conv_dt = self.conv_dtype

        @jax.jit
        def run(params, images, fr_of, cy, cx):
            from trackmpnn_tpu.backbones.layers import conv_compute

            with conv_compute(conv_dt):
                fmap = apply(params, images, False, None)
            return fmap[fr_of, cy, cx]

        return run

    def _pack(self, vis_meta):
        T = len(vis_meta["images"])
        h, w = self.input_hw
        t_cap = max(((T + 3) // 4) * 4, 4)  # bucket the frame axis (recompiles)
        images = np.zeros((t_cap, h, w, 3), np.float32)
        for t, (p, hf) in enumerate(vis_meta["images"]):
            images[t] = load_image(p, hf, self.input_hw)
        # pad the frame axis by CYCLING real frames: all-zero padding frames
        # would contaminate train-mode BatchNorm statistics (bn2d pools over
        # N,H,W with no frame mask), both in the normalization and in the
        # running-buffer updates
        for t in range(T, t_cap):
            images[t] = images[t % T]
        fr_of, cys, cxs = [], [], []
        for t, (cy, cx) in enumerate(vis_meta["centers"]):
            fr_of.extend([t] * len(cy))
            cys.extend(cy.tolist())
            cxs.extend(cx.tolist())
        n = len(fr_of)
        cap = self.max_dets
        while cap < n:
            cap *= 2
        pad = cap - n
        fr_of = np.array(fr_of + [0] * pad, np.int32)
        cys = np.array(cys + [0] * pad, np.int32)
        cxs = np.array(cxs + [0] * pad, np.int32)
        # centers must already be FEATURE-MAP coords (data.common.
        # center_indices divides by down_ratio); input-pixel coords would
        # silently clamp in the gather and train on edge pixels
        fh, fw = h // self.down_ratio, w // self.down_ratio
        if n and (cys[:n].max() >= fh or cxs[:n].max() >= fw):
            raise ValueError(
                f"center coords exceed the {fh}x{fw} feature map (down_ratio="
                f"{self.down_ratio}); pass fmap-space centers, see "
                "data.common.center_indices")
        valid = np.arange(cap) < n
        return images, fr_of, cys, cxs, valid, n

    def train_chunk(self, vis_meta, track_ids: np.ndarray):
        """One embed train step over a chunk.  track_ids: int per det
        (-1 = FP).  Returns (vis_feats [N, C] np, loss)."""
        images, fr_of, cy, cx, valid, n = self._pack(vis_meta)
        tids = np.full(len(valid), -1, np.int32)
        tids[:n] = track_ids[:n]
        self._drop_key, rng = jax.random.split(self._drop_key)
        self.params, self.opt_state, loss, feats = self._step(
            self.params, self.opt_state, jnp.asarray(images),
            jnp.asarray(fr_of), jnp.asarray(cy), jnp.asarray(cx),
            jnp.asarray(tids), jnp.asarray(valid), rng,
        )
        return np.asarray(feats)[:n], float(loss)

    def infer_chunk(self, vis_meta):
        images, fr_of, cy, cx, valid, n = self._pack(vis_meta)
        feats = self._infer(self.params, jnp.asarray(images), jnp.asarray(fr_of),
                            jnp.asarray(cy), jnp.asarray(cx))
        return np.asarray(feats)[:n]


def normalized_vis_features(raw_feats: np.ndarray) -> np.ndarray:
    """softmax over the embedding dim, then the reference's (x-0.5)/0.5
    standardization of the vis block (kitti_mot.py:163-177, 563-566)."""
    e = np.exp(raw_feats - raw_feats.max(axis=1, keepdims=True))
    sm = e / e.sum(axis=1, keepdims=True)
    return ((sm - 0.5) / 0.5).astype(np.float32)
