"""Inference engine: chat-style requests -> conditioned sampling -> decoded
text/images.

Redesign of the reference demo engine (reference: demo/inference.py:63-460 —
message parsing with base64 images and `<mask>` expansion :102-123, task
selection gen-img/gen-txt/inpaint, x0/x0_unmask construction :269+,
model._sample, re-encode outputs). All samplers are jitted once per task and
reused across requests.
"""

from __future__ import annotations

import base64
import io
import re
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.sampling.sampler import build_sampler

MASK_TOKEN_RE = re.compile(r"<mask(?::(\d+))?>")


def expand_mask_tokens(text: str) -> str:
    """`<mask:5>` -> five `<mask>` markers (reference:
    demo/inference.py:102-123)."""
    return MASK_TOKEN_RE.sub(
        lambda m: "<mask>" * int(m.group(1) or 1), text)


class InferenceEngine:
    def __init__(self, config: Config, model, params, *, tokenizer=None,
                 codec=None, mesh=None, rolling: int = 0,
                 ar_draft=None, gamma: int = 4,
                 lookup_ngram: Optional[int] = None):
        self.config = config
        self.model = model
        self.mesh = mesh
        # ar_draft = (draft_model, draft_model_cfg, draft_params): the AR
        # continuous batcher decodes in speculative draft-verify rounds
        # (serving/continuous.py draft=) — DIT-AR counterpart of the ELM
        # engine's --speculative route. lookup_ngram: draft-free prompt
        # lookup speculation instead (mutually exclusive).
        self._ar_draft = ar_draft
        self._gamma = gamma
        self._lookup_ngram = lookup_ngram
        # rolling > 0: serve diffusion requests through the rolling
        # continuous batcher (serving/rolling.py) with that many slots —
        # requests admit into finished rows mid-flight instead of
        # waiting for whole-batch boundaries
        self._rolling_slots = rolling
        self._rolling: Dict[int, Any] = {}
        if mesh is not None:
            # multi-chip serving (parallel/sample.py): weights live
            # sharded on the mesh; samplers are wrapped below
            from unidisc_tpu.parallel.sample import (batch_multiple,
                                                     shard_params,
                                                     validate_mesh)
            validate_mesh(config, mesh)
            params = shard_params(params, mesh)
            self._batch_multiple = batch_multiple(config, mesh)
        else:
            self._batch_multiple = 1
        self.params = params
        self.m = config.model
        if tokenizer is None:
            from unidisc_tpu.tokenizers.text import get_tokenizer
            tokenizer = get_tokenizer("byte")
        self.tokenizer = tokenizer
        self.codec = codec  # optional ImageCodec for pixel I/O
        self._samplers: Dict[int, Any] = {}
        # serializes device execution + sampler-cache mutation across
        # threads (HTTP handler threads and the batcher worker both call
        # into the engine)
        import threading
        self._device_lock = threading.Lock()

        def forward_logits(params, x, sigma, modality):
            return model.apply({"params": params}, x, sigma,
                               modality=modality)
        self._forward = forward_logits
        # public alias: the eval/reward stack wants a bare apply_fn
        # (params, x, sigma, modality) -> logits
        self.apply_fn = forward_logits

    # ------------------------------------------------------------------
    @property
    def continuous(self):
        """Continuous AR batcher (parameterization=ar models): requests
        join/leave a persistent device batch (serving/continuous.py).
        Lazily built; shares the engine's device lock so it serializes
        against the diffusion samplers."""
        if self.config.trainer.parameterization != "ar":
            raise ValueError("continuous batching needs an AR model "
                             "(trainer.parameterization=ar)")
        if getattr(self, "_continuous", None) is None:
            # double-checked under the device lock: concurrent first
            # requests must not build two batchers (each allocates a
            # full device KV state and owns a worker thread)
            with self._device_lock:
                if getattr(self, "_continuous", None) is None:
                    from unidisc_tpu.serving.continuous import \
                        ContinuousBatcher
                    eos = getattr(self.tokenizer, "eos_token_id", None)
                    params = self.params
                    kw = {}
                    if self._ar_draft is not None:
                        from unidisc_tpu.sampling.ar_sampler import \
                            init_kv_cache_for
                        d_model, d_mcfg, d_params = self._ar_draft

                        def draft_apply(p, tok, mod_tok, kv, ci):
                            sigma = jnp.zeros((tok.shape[0],),
                                              jnp.float32)
                            return d_model.apply(
                                {"params": p}, tok, sigma,
                                modality=mod_tok, kv_cache=kv,
                                cache_index=ci)

                        kw = dict(
                            draft=(draft_apply,
                                   lambda b, L: init_kv_cache_for(
                                       d_mcfg, b, L)),
                            gamma=self._gamma)
                        params = (params, d_params)
                    elif self._lookup_ngram:
                        kw = dict(lookup_ngram=self._lookup_ngram,
                                  gamma=self._gamma)
                    self._continuous = ContinuousBatcher(
                        self.model, params, self.config,
                        slots=8, chunk=8,
                        eos_id=eos if eos is not None else -1,
                        device_lock=self._device_lock, **kw)
        return self._continuous

    def complete_text(self, text: str, *, max_new_tokens: int = 64,
                      temperature: float = 0.0, seed: Optional[int] = None,
                      stream_cb=None):
        """Text completion through the continuous batcher. Returns a
        Future resolving to {'text', 'tokens', 'prompt_len'}."""
        prompt = self.tokenizer.encode(text or "", add_bos=True,
                                       add_eos=False)[:self.m.length - 2]
        fut = self.continuous.submit(
            prompt, max_new_tokens=max_new_tokens, temperature=temperature,
            seed=seed, stream_cb=stream_cb)

        from concurrent.futures import Future
        out: Future = Future()

        def _done(f):
            try:
                res = f.result()
                res["text"] = self.tokenizer.decode(res["tokens"])
                out.set_result(res)
            except Exception as e:  # noqa: BLE001
                out.set_exception(e)
        fut.add_done_callback(_done)
        return out

    # ------------------------------------------------------------------
    def _jit(self, fn):
        """jit a built sampler — SPMD-wrapped when serving on a mesh."""
        if self.mesh is not None:
            from unidisc_tpu.parallel.sample import spmd_sampler
            return spmd_sampler(fn, self.config, self.mesh)
        return jax.jit(fn)

    def _sampler(self, steps: Optional[int] = None):
        key = steps or self.config.sampling.steps
        if key not in self._samplers:
            # under scaffold decoding the generic sampler runs the
            # (big, small) dispatch forward; its params are the tuple
            # from _sampler_params
            fwd = self._scaffold_forward if getattr(self, "_scaffold",
                                                    False) else self._forward
            self._samplers[key] = self._jit(build_sampler(
                fwd, self.config, num_steps=key))
        return self._samplers[key]

    def _t2i_sampler(self, steps: Optional[int] = None):
        """Span-factored fast path for fully-text-conditioned generation
        (44% faster at 115M; falls back to the generic sampler for
        partial-text infilling)."""
        key = ("t2i", steps or self.config.sampling.steps)
        if key not in self._samplers:
            from unidisc_tpu.sampling.t2i_fast import build_t2i_sampler
            s = self.config.sampling
            self._samplers[key] = self._jit(build_t2i_sampler(
                self.model, self.config, num_steps=key[1],
                cached_cond=s.cached_cond,
                cond_refresh=s.cached_cond_refresh))
        return self._samplers[key]

    def enable_scaffold(self, model_small, params_small, split: int):
        """Scaffold decoding (sampling/scaffold.py — measured 97% of
        big-only accuracy at 26% compute, BASELINE.md): rewire the
        forward so steps [0, split) run this engine's model and the
        remainder run `model_small`.

        `self.params` STAYS the big model's params (so `apply_fn`, the
        interleaved route, and the eval/reward stack keep working on the
        base model); the scaffold samplers receive the tuple
        `(params_big, params_small)` via `_sampler_params`. Disables the
        span-factored t2i fastpath and rolling admission (both are
        incompatible: the fastpath calls model.apply directly; rolling
        rows sit at DIFFERENT denoise steps while the scaffold dispatch
        is lockstep — per-row model choice would cost big+small every
        step, erasing the saving) and clears compiled sampler caches.
        The small model must share vocab + length."""
        if self.config.trainer.parameterization == "ar":
            raise ValueError("scaffold decoding schedules DIFFUSION "
                             "denoise steps; it does not apply to AR "
                             "models (use --speculative for AR)")
        from unidisc_tpu.sampling.scaffold import build_scaffold_forward
        big_forward = self._forward

        def small_forward(p, x, sigma, m):
            return model_small.apply({"params": p}, x, sigma, modality=m)

        self._scaffold_forward = build_scaffold_forward(
            big_forward, small_forward, self.config, split=split)
        self._scaffold_small = params_small
        self._samplers.clear()
        self._scaffold = True

    @property
    def _sampler_params(self):
        """Params pytree the generic samplers take: the base params, or
        (big, small) once scaffold decoding is enabled."""
        if getattr(self, "_scaffold", False):
            return (self.params, self._scaffold_small)
        return self.params

    def _rolling_batcher(self):
        """ONE batcher at the config's max step count — per-request
        step overrides ride the ragged row_steps state, so a fast
        8-step request and a 32-step request share the same persistent
        batch (no per-steps batcher pool). Creation is locked (HTTP
        request threads race the first call) and the batcher serializes
        its device dispatch on the engine's _device_lock."""
        with self._device_lock:
            if "batcher" not in self._rolling:
                from unidisc_tpu.serving.rolling import \
                    RollingDiffusionBatcher
                self._rolling["batcher"] = RollingDiffusionBatcher(
                    self._forward, self.params, self.config,
                    slots=self._rolling_slots,
                    dispatch_lock=self._device_lock)
        return self._rolling["batcher"]

    def _layout(self, batch: int):
        m = self.m
        modality = np.concatenate([
            np.zeros((batch, m.txt_length), np.int32),
            np.ones((batch, m.img_length), np.int32)], axis=-1)
        return modality

    # ------------------------------------------------------------------
    def prepare(self, *, text: Optional[str] = None,
                image_ids: Optional[np.ndarray] = None,
                image_mask: Optional[np.ndarray] = None,
                task: str = "auto") -> dict:
        """Build one request's conditioning row.

        Returns {"task", "x0" (L,), "unmask" (L,), "fastpath" (bool)} —
        fastpath means the span-factored t2i sampler applies (text fully
        conditioned, whole image generated)."""
        m = self.m
        if task == "auto":
            if text is not None and image_ids is None:
                task = "gen_image"
            elif image_ids is not None and text is None:
                task = "gen_text"
            elif text is None and image_ids is None:
                task = "joint"
            else:
                task = "infill"

        x0 = np.zeros(m.length, np.int32)
        unmask = np.zeros(m.length, bool)

        if text is not None:
            text = expand_mask_tokens(text)
            parts = text.split("<mask>")
            ids: List[int] = []
            known: List[bool] = []
            for i, part in enumerate(parts):
                enc = self.tokenizer.encode(part, add_bos=(i == 0),
                                            add_eos=False)
                ids.extend(enc)
                known.extend([True] * len(enc))
                if i < len(parts) - 1:
                    ids.append(0)
                    known.append(False)  # masked slot
            ids = ids[:m.txt_length]
            known = known[:m.txt_length]
            x0[:len(ids)] = np.asarray(ids)
            if task in ("gen_image", "infill"):
                unmask[:len(known)] = np.asarray(known)
            if task == "gen_image" and "<mask>" not in text:
                # t2i semantics: the prompt IS the full text conditioning —
                # pad the rest of the text span (pad id) and mark it known
                # (enables the span-factored fast sampler)
                pad = getattr(self.tokenizer, "pad_token_id", 0)
                x0[len(ids):m.txt_length] = pad
                unmask[:m.txt_length] = True

        if image_ids is not None:
            image_ids = np.asarray(image_ids).reshape(-1)[:m.img_length]
            x0[m.txt_length:m.txt_length + len(image_ids)] = \
                image_ids + (0 if image_ids.max(initial=0) >=
                             m.text_vocab_size else m.text_vocab_size)
            img_known = np.ones(len(image_ids), bool)
            if image_mask is not None:
                img_known &= ~np.asarray(image_mask).reshape(-1)[
                    :len(image_ids)]
            if task in ("gen_text", "infill"):
                unmask[m.txt_length:m.txt_length + len(image_ids)] = \
                    img_known

        fastpath = (task == "gen_image" and
                    bool(unmask[:m.txt_length].all()) and
                    not unmask[m.txt_length:].any() and
                    self.config.sampling.predictor.startswith("maskgit"))
        return {"task": task, "x0": x0, "unmask": unmask,
                "fastpath": fastpath}

    def run_batch(self, prepared: List[dict], *, steps: Optional[int] = None,
                  seed: int = 0, pad_to: Optional[int] = None) -> List[dict]:
        """Run N prepared requests as ONE device batch.

        All rows must agree on `fastpath`. pad_to rounds the batch up with
        duplicate rows so only a few batch shapes ever compile (the
        batcher passes powers of two up to the per-chip optimum)."""
        if self._rolling_slots and not getattr(self, "_scaffold", False):
            # rolling mode: the batcher's worker owns device dispatch;
            # per-row seeds keep results independent of co-tenancy.
            # Scaffold decoding bypasses rolling: its big/small dispatch
            # is lockstep (one model per denoise step) while rolling rows
            # sit at different steps — see enable_scaffold.
            return self._run_batch_rolling(prepared, steps=steps,
                                           seed=seed)
        with self._device_lock:
            return self._run_batch_locked(prepared, steps=steps, seed=seed,
                                          pad_to=pad_to)

    def _rolling_t2i(self):
        """Span-factored rolling batcher for pure t2i requests (shares
        nothing with the generic one — each owns its persistent state)."""
        with self._device_lock:
            if "t2i" not in self._rolling:
                from unidisc_tpu.serving.rolling import RollingT2IBatcher
                self._rolling["t2i"] = RollingT2IBatcher(
                    self.model, self.params, self.config,
                    slots=self._rolling_slots,
                    dispatch_lock=self._device_lock)
        return self._rolling["t2i"]

    def _run_batch_rolling(self, prepared, *, steps, seed):
        m = self.m
        fastpath = all(p["fastpath"] for p in prepared) and \
            self.config.sampling.maskgit_dilation in (None, 0, 1) and \
            not getattr(self, "_scaffold", False)
        batcher = self._rolling_t2i() if fastpath \
            else self._rolling_batcher()
        req_steps = min(steps or self.config.sampling.steps,
                        batcher.built.steps)
        mod_row = None if fastpath else self._layout(1)[0]
        futs = []
        for i, p in enumerate(prepared):
            row_seed = (seed * 0x9E3779B1 + i) & 0x7FFFFFFF
            if fastpath:
                futs.append(batcher.submit(p["x0"][:m.txt_length],
                                           seed=row_seed,
                                           steps=req_steps))
            else:
                futs.append(batcher.submit(p["x0"], p["unmask"], mod_row,
                                           seed=row_seed,
                                           steps=req_steps))
        tokens = np.stack([f.result(timeout=600) for f in futs])
        nfe = req_steps + batcher.built.extra
        return self._decode_rows(prepared, tokens, nfe)

    def _run_batch_locked(self, prepared, *, steps, seed, pad_to):
        m = self.m
        n = len(prepared)
        assert n > 0
        fastpath = all(p["fastpath"] for p in prepared) and \
            not getattr(self, "_scaffold", False)
        x0 = np.stack([p["x0"] for p in prepared])
        unmask = np.stack([p["unmask"] for p in prepared])
        if pad_to and pad_to > n:
            reps = pad_to - n
            x0 = np.concatenate([x0, np.repeat(x0[-1:], reps, 0)])
            unmask = np.concatenate([unmask, np.repeat(unmask[-1:], reps, 0)])
        mult = self._batch_multiple
        if x0.shape[0] % mult:
            # mesh granule (dp width x pp microbatches): round up with
            # duplicate rows, dropped again after sampling
            reps = mult - x0.shape[0] % mult
            x0 = np.concatenate([x0, np.repeat(x0[-1:], reps, 0)])
            unmask = np.concatenate([unmask, np.repeat(unmask[-1:], reps, 0)])
        b = x0.shape[0]

        if fastpath:
            sample = self._t2i_sampler(steps)
            out = sample(self.params, jax.random.PRNGKey(seed),
                         jnp.asarray(x0[:, :m.txt_length]))
        else:
            sample = self._sampler(steps)
            out = sample(self._sampler_params, jax.random.PRNGKey(seed),
                         jnp.asarray(x0), jnp.asarray(unmask),
                         jnp.asarray(self._layout(b)))
        tokens = np.asarray(out.tokens)[:n]
        return self._decode_rows(prepared, tokens, int(out.nfe))

    def _decode_rows(self, prepared, tokens, nfe):
        """Shared decode tail: token rows -> per-request result dicts."""
        m = self.m
        txt_ids = tokens[:, :m.txt_length]
        img_ids = tokens[:, m.txt_length:] - m.text_vocab_size
        from unidisc_tpu.tokenizers.text import wrapped_batch_decode
        texts = wrapped_batch_decode(self.tokenizer, txt_ids)

        results = []
        decode_imgs = self.codec is not None
        if decode_imgs:
            # clamp out-of-codebook ids (negatives = text leakage; above
            # image_vocab_size = label tokens when model.add_labels is set
            # — reference invalid_img_mask, model_eval.py:2887-2888)
            imgs = np.asarray(self.codec.decode(
                self.codec.params,
                jnp.asarray(np.clip(img_ids, 0, m.image_vocab_size - 1))))
        for i, p in enumerate(prepared):
            r = {"task": p["task"], "text": texts[i], "texts": [texts[i]],
                 "image_ids": img_ids[i:i + 1], "nfe": int(nfe)}
            if decode_imgs and p["task"] != "gen_text":
                r["images_b64"] = [encode_image_b64(imgs[i])]
            results.append(r)
        return results

    # ------------------------------------------------------------------
    # interleaved documents (multi-image, generate-slots, spatial masks)
    # ------------------------------------------------------------------
    def _interleaved_sampler(self, steps: Optional[int] = None):
        """Jitted sampler threading sample_ids/rope_index through the
        forward via closure over TRACED values (one compile per shape, not
        per request — the arrays are jit arguments, not constants)."""
        key = ("interleaved", steps or self.config.sampling.steps)
        if key not in self._samplers:
            model = self.model

            def run(params, rng, x0, unmask, modality, sample_ids,
                    rope_index):
                def fwd(p, x, sigma, m):
                    # CFG doubles the batch inside the sampler: tile the
                    # packing metadata to match
                    reps = x.shape[0] // sample_ids.shape[0]
                    si = jnp.tile(sample_ids, (reps, 1))
                    ri = jnp.tile(rope_index, (reps, 1))
                    return model.apply({"params": p}, x, sigma, modality=m,
                                       sample_ids=si, rope_index=ri)

                sample = build_sampler(fwd, self.config, num_steps=key[1])
                return sample(params, rng, x0, unmask, modality)

            self._samplers[key] = self._jit(run)
        return self._samplers[key]

    def run_interleaved(self, segments: List[dict], *,
                        steps: Optional[int] = None, seed: int = 0) -> dict:
        """Generate over one interleaved multimodal document
        (reference: demo/inference.py:161-330 interleaved requests).

        segments: ordered list of dicts —
          {"kind": "text", "text": str}                    given text
          {"kind": "text", "generate": N}                  N-token text slot
          {"kind": "image", "ids": (G*G,) array,
           "pixel_mask": optional (H,W[,C]) bool}          given image; the
             pixel mask (any-pooled to the token grid) marks the region to
             REGENERATE (spatial inpainting)
          {"kind": "image", "generate": True, "grid": G}   full image slot

        Returns segments with generated content filled in, plus raw tokens.
        """
        with self._device_lock:
            return self._run_interleaved_locked(segments, steps=steps,
                                                seed=seed)

    def _run_interleaved_locked(self, segments, *, steps, seed):
        m = self.m
        L = m.length
        x0 = np.zeros(L, np.int32)
        unmask = np.zeros(L, bool)
        modality = np.zeros(L, np.int32)
        sample_ids = np.full(L, -1, np.int32)
        rope_index = np.zeros(L, np.int32)
        spans = []  # (kind, start, end, grid)
        pos, txt_pos = 0, 0

        for seg in segments:
            if seg["kind"] == "text":
                if seg.get("generate"):
                    n = int(seg["generate"])
                    ids = np.zeros(n, np.int32)
                    known = np.zeros(n, bool)
                else:
                    # given text is fully conditioning; use a generate
                    # slot for free-text spans (the flat run() API handles
                    # <mask> infilling within a single text)
                    ids = np.asarray(self.tokenizer.encode(
                        seg["text"], add_bos=(pos == 0), add_eos=False),
                        np.int32)
                    known = np.ones(len(ids), bool)
                n = len(ids)
                assert pos + n <= L, "document exceeds model length"
                x0[pos:pos + n] = ids
                unmask[pos:pos + n] = known
                rope_index[pos:pos + n] = np.arange(txt_pos, txt_pos + n)
                txt_pos += n
                spans.append(("text", pos, pos + n, 0))
            else:
                if seg.get("generate"):
                    g = int(seg.get("grid", int(m.img_length ** 0.5)))
                    ids = np.zeros(g * g, np.int32)
                    known = np.zeros(g * g, bool)
                else:
                    raw = np.asarray(seg["ids"], np.int32).reshape(-1)
                    g = int(len(raw) ** 0.5)
                    ids = raw + (0 if raw.max(initial=0) >=
                                 m.text_vocab_size else m.text_vocab_size)
                    known = np.ones(g * g, bool)
                    if seg.get("pixel_mask") is not None:
                        pm = np.asarray(seg["pixel_mask"])
                        d = pm.shape[0] // g
                        known &= ~downscale_bool_mask(pm, d).reshape(-1)
                n = len(ids)
                assert pos + n <= L, "document exceeds model length"
                x0[pos:pos + n] = ids
                unmask[pos:pos + n] = known
                modality[pos:pos + n] = 1
                rope_index[pos:pos + n] = np.arange(n)  # raster, per image
                spans.append(("image", pos, pos + n, g))
            pos += n

        sample_ids[:pos] = 0  # one document per row

        sampler = self._interleaved_sampler(steps)
        # a mesh granule > 1 needs the single document tiled across rows
        reps = self._batch_multiple
        tile = lambda a: jnp.asarray(np.repeat(a[None], reps, 0))
        out = sampler(self.params, jax.random.PRNGKey(seed),
                      tile(x0), tile(unmask), tile(modality),
                      tile(sample_ids), tile(rope_index))
        tokens = np.asarray(out.tokens)[0]

        from unidisc_tpu.tokenizers.text import wrapped_batch_decode
        result_segments = []
        for kind, start, end, g in spans:
            if kind == "text":
                txt = wrapped_batch_decode(self.tokenizer,
                                           tokens[None, start:end])[0]
                result_segments.append({"kind": "text", "text": txt})
            else:
                ids = np.clip(tokens[start:end] - m.text_vocab_size, 0,
                              m.image_vocab_size - 1)
                seg_out = {"kind": "image", "ids": ids, "grid": g}
                if self.codec is not None:
                    try:
                        img = np.asarray(self.codec.decode(
                            self.codec.params, jnp.asarray(ids[None])))[0]
                        seg_out["image_b64"] = encode_image_b64(img)
                    except Exception:  # grid/codec mismatch: ids only
                        pass
                result_segments.append(seg_out)
        return {"segments": result_segments, "tokens": tokens,
                "nfe": int(out.nfe)}

    def run(self, *, text: Optional[str] = None,
            image_ids: Optional[np.ndarray] = None,
            image_mask: Optional[np.ndarray] = None,
            task: str = "auto", steps: Optional[int] = None,
            seed: int = 0, batch: int = 1) -> dict:
        """One request (batch>1 replicates it; see run_batch for true
        multi-request batching).

        task: 'gen_image' (text given, image masked), 'gen_text' (image
        given, text masked), 'infill' (both given; `<mask>` spans in text
        and/or image_mask positions are regenerated), 'joint'
        (unconditional joint generation), or 'auto'.
        """
        p = self.prepare(text=text, image_ids=image_ids,
                         image_mask=image_mask, task=task)
        results = self.run_batch([p] * batch, steps=steps, seed=seed)
        first = dict(results[0])
        first["texts"] = [r["text"] for r in results]
        if "images_b64" in first:
            first["images_b64"] = [b for r in results
                                   for b in r.get("images_b64", [])]
        import numpy as _np
        first["image_ids"] = _np.concatenate(
            [r["image_ids"] for r in results], 0)
        return first


class ElmEngine:
    """Serves the OpenELM AR baseline (models/elm.py) over HTTP through
    the continuous batcher (VERDICT r2 #4: the reference serves any
    configured backbone, demo/server.py:117-219 + demo/inference.py:63;
    previously only DIT models had a serving route).

    Exposes the engine surface the server's AR text route uses:
    .config.trainer.parameterization == 'ar', .tokenizer, .codec (text
    only), and .complete_text() -> Future.
    """

    def __init__(self, elm_cfg, model, params, *, tokenizer=None,
                 kv_cache: Optional[str] = None, slots: int = 8,
                 chunk: int = 8, draft=None, gamma: int = 4,
                 lookup_ngram: Optional[int] = None):
        import threading
        import types as _types

        self.elm_cfg = elm_cfg
        self.model = model
        self.params = params
        self.codec = None
        # draft = (draft_model, draft_cfg, draft_params): the continuous
        # batcher decodes in speculative draft-verify rounds — one target
        # read per `gamma` draft proposals (serving/continuous.py draft=)
        self._draft = draft
        self._gamma = gamma
        self._lookup_ngram = lookup_ngram
        # minimal config shim for the server's routing checks
        self.config = _types.SimpleNamespace(
            trainer=_types.SimpleNamespace(parameterization="ar"),
            sampling=_types.SimpleNamespace(steps=0),
            model=_types.SimpleNamespace(length=elm_cfg.max_length))
        self.m = self.config.model
        if tokenizer is None:
            from unidisc_tpu.tokenizers.text import get_tokenizer
            tokenizer = get_tokenizer("byte")
        self.tokenizer = tokenizer
        self._kv_cache = kv_cache
        self._slots, self._chunk = slots, chunk
        self._device_lock = threading.Lock()
        self._continuous = None

    @property
    def continuous(self):
        if self._continuous is None:
            with self._device_lock:
                if self._continuous is None:
                    from unidisc_tpu.serving.continuous import \
                        elm_continuous_batcher
                    eos = getattr(self.tokenizer, "eos_token_id", None)
                    self._continuous = elm_continuous_batcher(
                        self.model, self.params, self.elm_cfg,
                        slots=self._slots, chunk=self._chunk,
                        eos_id=eos if eos is not None else -1,
                        quant_cache=self._kv_cache == "int8",
                        draft=self._draft, gamma=self._gamma,
                        lookup_ngram=self._lookup_ngram,
                        device_lock=self._device_lock)
        return self._continuous

    def complete_text(self, text: str, *, max_new_tokens: int = 64,
                      temperature: float = 0.0, seed: Optional[int] = None,
                      stream_cb=None):
        prompt = self.tokenizer.encode(
            text or "", add_bos=True,
            add_eos=False)[:self.elm_cfg.max_length - 2]
        fut = self.continuous.submit(
            prompt, max_new_tokens=max_new_tokens,
            temperature=temperature, seed=seed, stream_cb=stream_cb)

        from concurrent.futures import Future
        out: Future = Future()

        def _done(f):
            try:
                res = f.result()
                res["text"] = self.tokenizer.decode(res["tokens"])
                out.set_result(res)
            except Exception as e:  # noqa: BLE001
                out.set_exception(e)
        fut.add_done_callback(_done)
        return out


def build_elm_engine(*, preset: str = "270m",
                     quantize: Optional[str] = None,
                     kv_cache: Optional[str] = None,
                     speculative: Optional[str] = None,
                     gamma: int = 4,
                     lora: Optional[str] = None,
                     tokenizer=None) -> "ElmEngine":
    """Build the OpenELM serving engine: `--model elm` (default 270m) or
    `--model elm:tiny|270m|450m|1.1b`; quantize='int8' serves int8 W8A8
    weights, kv_cache='int8' the int8 KV cache; speculative='<preset>'
    serves through the draft-verify speculative decoder with that
    (smaller, same-vocab) draft preset proposing `gamma` tokens per
    target read (serving/speculative.py — greedy decoding stays lossless
    vs the plain path)."""
    import dataclasses

    import jax

    from unidisc_tpu.models.elm import ELM_PRESETS, init_elm

    cfg = ELM_PRESETS[preset]
    model, params = init_elm(jax.random.PRNGKey(0), cfg)
    if lora:
        # ELM is the reference's actual LoRA target (qkv_proj,
        # model_setup.py:175-188): merge the saved adapter BEFORE int8
        # quantization so quantization sees the final weights
        from unidisc_tpu.training.lora import load_lora, merge_lora
        adapter, l_alpha, l_rank = load_lora(lora)
        params = merge_lora(params, adapter, alpha=l_alpha, rank=l_rank)
    if quantize == "int8":
        from unidisc_tpu.models.elm import OpenELM
        from unidisc_tpu.ops.quant import quantize_elm_params
        params = quantize_elm_params(params, cfg)
        cfg = dataclasses.replace(cfg, quant="int8")
        model = OpenELM(cfg)
    draft, lookup_ngram = None, None
    if speculative and (speculative == "lookup"
                        or speculative.startswith("lookup:")):
        # draft-FREE prompt-lookup speculation: --speculative lookup[:N]
        _, _, n = speculative.partition(":")
        lookup_ngram = int(n) if n else 2
    elif speculative:
        d_cfg = ELM_PRESETS[speculative]
        if (d_cfg.vocab_size + d_cfg.extra_tokens
                != cfg.vocab_size + cfg.extra_tokens):
            # same-vocab requirement: align the draft's extra tokens
            d_cfg = dataclasses.replace(
                d_cfg, vocab_size=cfg.vocab_size,
                extra_tokens=cfg.extra_tokens)
        d_cfg = dataclasses.replace(d_cfg, max_length=cfg.max_length)
        d_model, d_params = init_elm(jax.random.PRNGKey(1), d_cfg)
        draft = (d_model, d_cfg, d_params)
    return ElmEngine(cfg, model, params, tokenizer=tokenizer,
                     kv_cache=kv_cache, draft=draft, gamma=gamma,
                     lookup_ngram=lookup_ngram)


def parse_mesh_spec(spec: str):
    """'fsdp=2,pp=2' / 'pp=4' -> a live jax.sharding.Mesh over the
    session's devices (unnamed axes default to 1; one axis may be -1 =
    all remaining devices)."""
    from unidisc_tpu.config import MeshConfig
    from unidisc_tpu.parallel.mesh import make_mesh
    kw = {}
    for part in spec.split(","):
        k, _, v = part.strip().partition("=")
        if k not in ("dcn", "fsdp", "tensor", "seq", "pp",
                     "pp_microbatches"):
            raise ValueError(f"unknown mesh axis {k!r}")
        kw[k] = int(v)
    kw.setdefault("fsdp", 1)
    return make_mesh(MeshConfig(**kw)), kw


def build_engine(*, preset: str = "small", checkpoint: Optional[str] = None,
                 reference_ckpt: Optional[str] = None,
                 codec_name: Optional[str] = None,
                 steps: Optional[int] = None,
                 quantize: Optional[str] = None,
                 lora: Optional[str] = None,
                 kv_cache: Optional[str] = None,
                 mesh: Optional[str] = None,
                 rolling: int = 0,
                 scaffold: Optional[str] = None,
                 scaffold_split: int = 8,
                 speculative: Optional[str] = None,
                 spec_gamma: int = 4,
                 experiments=None) -> "InferenceEngine":
    """Construct an engine from a config preset and optional run dir
    (EMA params) + codec — the shared bootstrap for the server, the
    scoring battery, and scripts. quantize="int8" serves with W8A8 int8
    matmuls (ops/quant.py; ~1.4x sampling throughput on v5e);
    kv_cache="int8" decodes AR models on an int8 KV cache;
    mesh="fsdp=2,pp=2" serves SPMD across chips (parallel/sample.py —
    data-parallel + depth-wise pipeline over the diffusion samplers);
    rolling=N serves diffusion requests through the rolling continuous
    batcher with N slots (serving/rolling.py — per-row denoise steps,
    mid-flight admission); scaffold="preset[=ckpt_dir]" +
    scaffold_split=K runs denoise steps [0, K) on the main model and
    the rest on the (smaller) scaffold model — measured 97% of big-only
    accuracy at 26% compute at K=8/32 (sampling/scaffold.py,
    BASELINE.md); the scaffold model is forced onto the main model's
    vocab/length so the one-scan lax.cond sampler applies."""
    import dataclasses
    import json as _json

    import jax

    from unidisc_tpu.config import Config
    from unidisc_tpu.models.dit import init_dit

    if preset == "elm" or preset.startswith("elm:"):
        # OpenELM AR baseline route: `--model elm` / `--model elm:450m`
        assert checkpoint is None, "ELM serving takes no --ckpt (train " \
            "the DIT-AR route for checkpointed AR serving)"
        return build_elm_engine(
            preset=preset.split(":", 1)[1] if ":" in preset else "270m",
            quantize=quantize, kv_cache=kv_cache,
            speculative=speculative, gamma=spec_gamma, lora=lora)

    over = {"sampling.steps": steps} if steps else {}
    if kv_cache:
        over["model.kv_cache_dtype"] = kv_cache
    ref_sd = None
    if reference_ckpt:
        # published-checkpoint drop (aswerdlow/unidisc_* model.safetensors,
        # PyTorchModelHubMixin layout): the file's shapes determine the
        # architecture — the preset supplies only what weights can't
        # encode (sequence layout, rope_2d, sampling defaults)
        if checkpoint is not None:
            raise ValueError(
                "--reference-ckpt loads reference weights; --ckpt loads "
                "our own run dirs — pass one")
        from unidisc_tpu.models.port import (infer_dit_overrides,
                                             read_reference_state_dict)
        ref_sd = read_reference_state_dict(reference_ckpt)
        over = {**infer_dit_overrides(ref_sd), **over}
    config = Config.make(preset, **over)
    if experiments:
        config = config.apply_experiments(*experiments)
    model, params = init_dit(jax.random.PRNGKey(config.seed), config.model)
    if ref_sd is not None:
        from unidisc_tpu.models.port import port_dit_state_dict
        params = port_dit_state_dict(params, ref_sd)
    if checkpoint:
        from unidisc_tpu.training.checkpoint import CheckpointManager
        from unidisc_tpu.training.train_state import init_train_state
        mgr = CheckpointManager(f"{checkpoint}/checkpoints")
        meta = mgr.read_meta()
        snap = Config.from_json(_json.dumps(meta["config"]))
        if snap.model.lora_rank > 0:
            # a LoRA run dir: its checkpoints hold the rank-r ADAPTER
            # tree, not full params. Rebuild the frozen base exactly as
            # the Trainer did (recorded base run, else the deterministic
            # random init from the snapshot seed), restore the adapter
            # state, and merge — the served weights are base + EMA-adapter
            from unidisc_tpu.training.lora import (lora_from_config,
                                                   merge_lora)
            base_ckpt = meta.get("lora_base_checkpoint")
            if base_ckpt:
                from unidisc_tpu.training.trainer import restore_base_params
                base = restore_base_params(base_ckpt)
            else:
                _, base = init_dit(jax.random.PRNGKey(snap.seed),
                                   snap.model)
            adapter_t = lora_from_config(
                jax.random.PRNGKey(snap.seed + 1), base, snap.model)
            state, _ = mgr.restore(init_train_state(snap, adapter_t))
            params = merge_lora(base, state.ema_params,
                                alpha=snap.model.lora_alpha,
                                rank=snap.model.lora_rank)
        elif snap.trainer.host_offload_optimizer:
            # a host-offload run dir (training/offload.py): its
            # checkpoints hold the CHUNKED flat fp32 state, not a
            # TrainState. Rebuild the chunked template (host-resident on
            # a TPU runtime so 1.4B-class state never lands in HBM),
            # restore, and serve the gathered fp32 EMA weights — the
            # same weights the resident path serves.
            from unidisc_tpu.training.offload import (gather_ema,
                                                      init_offload_state)
            # template from the SNAPSHOT architecture (the run's model
            # config wins over the preset's — e.g. time_conditioning
            # adds adaLN parameters the preset may not have)
            _, snap_params = init_dit(jax.random.PRNGKey(snap.seed),
                                      snap.model)
            tmpl = init_offload_state(
                snap, snap_params,
                annotate=jax.default_backend() not in ("cpu",),
                chunks=snap.trainer.host_offload_chunks)
            ostate, _ = mgr.restore(tmpl)
            params = gather_ema(ostate)
        else:
            # template optimizer state from the SNAPSHOT config (the run
            # may have trained with a non-default optimizer)
            state, _ = mgr.restore(init_train_state(snap, params))
            params = state.ema_params
        config = snap
        # experiment overlays and CLI overrides both beat the checkpoint's
        # config snapshot (the snapshot records what was TRAINED, not what
        # is being served — an --experiments fast_nfe serve must survive
        # --ckpt restore)
        if experiments:
            config = config.apply_experiments(*experiments)
        if over:
            config = config.override(**over)
        # rebuild the module from the FINAL config — the snapshot
        # architecture wins by default (config started as snap: flag
        # differences like time_conditioning change the parameter tree,
        # not just shapes), but behavioral model.* fields from serve-time
        # overlays/overrides (attn_backend, kv_cache_dtype, quant flags)
        # must reach the module too; a rebuild from snap alone silently
        # dropped them. Parametric drift from an overlay fails loudly at
        # apply time (restored params no longer match the module).
        from unidisc_tpu.models.dit import DIT
        model = DIT(config.model, compute_dtype=jnp.bfloat16)
    if config.model.img_cond:
        # mirror compute_batch_loss's guard (train_state.py): the serving
        # request path has no conditioning-image stream, so an img_cond
        # model would silently skip its cond trunk and every
        # cross-attention block (models/dit.py gates on x_cond is not
        # None) and produce UNCONDITIONED samples. Fail loudly instead.
        raise ValueError(
            "model.img_cond=True checkpoint cannot be served: the engine "
            "supplies no x_cond conditioning stream (use the sampling "
            "API with an explicit x_cond, or serve a non-img_cond model)")
    if lora:
        # serve a LoRA fine-tune: merge the rank-r adapter saved by
        # training/lora.save_lora into the base weights ONCE at build
        # (so the hot path is the unchanged full-weight forward) — before
        # int8 quantization, which must see the final weights (reference
        # peft merge semantics; model_setup.py:175-188)
        from unidisc_tpu.training.lora import load_lora, merge_lora
        adapter, l_alpha, l_rank = load_lora(lora)
        params = merge_lora(params, adapter, alpha=l_alpha, rank=l_rank)
    if quantize:
        from unidisc_tpu.ops.quant import quantize_model
        config, model, params = quantize_model(config, params)
    codec = None
    if codec_name:
        from unidisc_tpu.tokenizers.image_codecs import get_codec
        grid = int(config.model.img_length ** 0.5)
        probe = get_codec(codec_name)
        codec = get_codec(codec_name,
                          image_size=grid * probe.downsample)
    live_mesh = None
    if mesh:
        live_mesh, mesh_kw = parse_mesh_spec(mesh)
        config = config.override(**{f"mesh.{k}": v
                                    for k, v in mesh_kw.items()})
    ar_draft, lookup_ngram = None, None
    if speculative:
        if config.trainer.parameterization != "ar":
            raise ValueError("--speculative needs an AR model "
                             "(trainer.parameterization=ar, or the "
                             "elm route); use --scaffold for diffusion "
                             "model-size scheduling")
        if speculative == "lookup" or speculative.startswith("lookup:"):
            # draft-FREE prompt-lookup speculation (serving/speculative
            # lookup_proposals): no draft model, works with any --ckpt
            _, _, n = speculative.partition(":")
            lookup_ngram = int(n) if n else 2
            speculative = None
    if speculative:
        d_preset, _, d_ckpt = speculative.partition("=")
        if checkpoint and not d_ckpt:
            # a randomly-initialized draft accepts ~1/V of a trained
            # target's tokens: every round then costs gamma+1 draft
            # forwards plus a verify to advance ~1 token — a silent
            # multi-x slowdown with bit-identical (greedy) output
            raise ValueError("--speculative with --ckpt needs a trained "
                             "draft: use --speculative preset=ckpt_dir")
        mcfg = config.model
        d_cfg = Config.make(d_preset).override(**{
            "model.length": mcfg.length,
            "model.txt_length": mcfg.txt_length,
            "model.img_length": mcfg.img_length,
            "model.text_vocab_size": mcfg.text_vocab_size,
            "model.image_vocab_size": mcfg.image_vocab_size,
            "model.full_attention": False,
            "model.time_conditioning": False,
            "model.dropout": 0.0,
        })
        d_model, d_params = init_dit(jax.random.PRNGKey(d_cfg.seed + 1),
                                     d_cfg.model)
        if d_ckpt:
            from unidisc_tpu.training.checkpoint import CheckpointManager
            from unidisc_tpu.training.train_state import init_train_state
            d_mgr = CheckpointManager(f"{d_ckpt}/checkpoints")
            d_state, _ = d_mgr.restore(init_train_state(d_cfg, d_params))
            d_params = d_state.ema_params
        ar_draft = (d_model, d_cfg.model, d_params)
    engine = InferenceEngine(config, model, params, codec=codec,
                             mesh=live_mesh, rolling=rolling,
                             ar_draft=ar_draft, gamma=spec_gamma,
                             lookup_ngram=lookup_ngram)
    if scaffold:
        if mesh:
            raise ValueError("scaffold decoding is single-host for now "
                             "(params become a (big, small) tuple that "
                             "shard_params does not know how to lay out)")
        s_preset, _, s_ckpt = scaffold.partition("=")
        mcfg = config.model
        s_cfg = Config.make(s_preset).override(**{
            # the scaffold trunk MUST share the io contract
            "model.length": mcfg.length,
            "model.txt_length": mcfg.txt_length,
            "model.img_length": mcfg.img_length,
            "model.text_vocab_size": mcfg.text_vocab_size,
            "model.image_vocab_size": mcfg.image_vocab_size,
            "model.force_argmax_valid_indices":
                mcfg.force_argmax_valid_indices,
            "model.dropout": 0.0,
        })
        s_model, s_params = init_dit(jax.random.PRNGKey(s_cfg.seed),
                                     s_cfg.model)
        if s_ckpt:
            from unidisc_tpu.training.checkpoint import CheckpointManager
            from unidisc_tpu.training.train_state import init_train_state
            s_mgr = CheckpointManager(f"{s_ckpt}/checkpoints")
            s_state, _ = s_mgr.restore(init_train_state(s_cfg, s_params))
            s_params = s_state.ema_params
        if quantize:
            # the late (small-trunk) steps are the bulk of the NFEs —
            # serve them int8 too
            from unidisc_tpu.ops.quant import quantize_model
            _, s_model, s_params = quantize_model(s_cfg, s_params)
        engine.enable_scaffold(s_model, s_params, scaffold_split)
    return engine


def downscale_bool_mask(mask: np.ndarray, d: int) -> np.ndarray:
    """Pixel-space edit mask (H, W[, C]) -> token-grid mask via any-pooling
    (reference: demo/inference.py:267-284 downscale_bool)."""
    mask = np.asarray(mask)
    if mask.ndim == 3:
        mask = mask.any(-1)
    h, w = mask.shape
    assert h % d == 0 and w % d == 0, f"mask {h}x{w} not divisible by {d}"
    return mask.reshape(h // d, d, w // d, d).any(axis=(1, 3))


def encode_image_b64(img: np.ndarray) -> str:
    """[-1,1] float image (H,W,3) -> base64 PNG."""
    from PIL import Image
    arr = np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)
    im = Image.fromarray(arr)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def decode_image_b64(data: str) -> np.ndarray:
    from PIL import Image
    im = Image.open(io.BytesIO(base64.b64decode(data))).convert("RGB")
    return np.asarray(im, np.float32) / 127.5 - 1.0
