"""Import/execute the ACTUAL reference code at /root/reference in tests.

Three facilities:

  * add_reference_path() — put /root/reference on sys.path (appended, so it
    never shadows repo modules) so `models.noise_schedule`, `models.dit_orig`
    etc. import as the reference expects.
  * install_torch_stubs() — minimal stand-ins for the CUDA-only modules the
    reference imports (`flash_attn`, `omegaconf`): the flash-attn rotary stub
    delegates to the reference's OWN pure-torch reimplementation
    (models/standalone_rotary.py:14-31), and the varlen attention stub is
    plain softmax attention at flash-attn's default head_dim**-0.5 scale.
  * extract_functions(path, names) — AST-extract named top-level functions
    from a reference source file and exec them in a provided namespace.
    Used for model_eval.py, whose module-level imports (wandb, tensordict,
    pandas, image_utils, ...) are irrelevant to the sampler math under test.

This module contains NO reference code — it loads and runs the reference
in-place so parity tests fail if our reading of its math drifted anywhere.
"""

from __future__ import annotations

import ast
import sys
import types

REFERENCE = "/root/reference"


def add_reference_path() -> None:
    if REFERENCE not in sys.path:
        # append (not prepend): reference top-level names (utils, model,
        # constants, ...) must never shadow repo/test imports
        sys.path.append(REFERENCE)


def install_torch_stubs() -> None:
    """Register flash_attn / omegaconf stand-ins in sys.modules."""
    add_reference_path()
    import torch

    if "flash_attn" not in sys.modules:
        from models.standalone_rotary import (
            flash_torch_apply_rotary_emb_torch)

        fa = types.ModuleType("flash_attn")
        layers = types.ModuleType("flash_attn.layers")
        rotary = types.ModuleType("flash_attn.layers.rotary")
        iface = types.ModuleType("flash_attn.flash_attn_interface")

        def apply_rotary_emb_qkv_(qkv, cos, sin):
            # qkv (B, S, 3, H, D); flash-attn rotates q and k in place and
            # leaves v untouched; cos/sin are (S, rotary_dim/2),
            # non-interleaved (GPT-NeoX halves) convention.
            q = flash_torch_apply_rotary_emb_torch(qkv[:, :, 0], cos, sin)
            k = flash_torch_apply_rotary_emb_torch(qkv[:, :, 1], cos, sin)
            return torch.stack([q, k, qkv[:, :, 2]], dim=2)

        def flash_attn_varlen_qkvpacked_func(qkv, cu_seqlens, max_seqlen,
                                             dropout_p, causal=False):
            # qkv ((B*S), 3, H, D) with equal-length sequences (the only
            # form dit_orig/autoregressive_orig use: cu_seqlens is an
            # arange with constant step max_seqlen)
            total, _, h, d = qkv.shape
            s = int(max_seqlen)
            b = total // s
            q = qkv[:, 0].reshape(b, s, h, d).transpose(1, 2)  # (B,H,S,D)
            k = qkv[:, 1].reshape(b, s, h, d).transpose(1, 2)
            v = qkv[:, 2].reshape(b, s, h, d).transpose(1, 2)
            scores = (q @ k.transpose(-2, -1)) * (d ** -0.5)
            if causal:
                i = torch.arange(s)[:, None]
                j = torch.arange(s)[None, :]
                scores = scores.masked_fill(j > i, float("-inf"))
            out = torch.softmax(scores.float(), dim=-1).to(v.dtype) @ v
            return out.transpose(1, 2).reshape(total, h, d)

        def flash_attn_func(q, k, v, dropout_p=0.0, softmax_scale=None,
                            causal=False):
            # q (B, Sq, H, D), k/v (B, Sk, H, D) -> (B, Sq, H, D); the
            # form the reference cross-attention uses
            # (models/dit.py:834-835 with k_cond/v_cond)
            d = q.shape[-1]
            scale = softmax_scale if softmax_scale is not None else d ** -0.5
            qh = q.transpose(1, 2)
            kh = k.transpose(1, 2)
            vh = v.transpose(1, 2)
            scores = (qh @ kh.transpose(-2, -1)) * scale
            if causal:
                i = torch.arange(q.shape[1])[:, None]
                j = torch.arange(k.shape[1])[None, :]
                scores = scores.masked_fill(j > i, float("-inf"))
            out = torch.softmax(scores.float(), dim=-1).to(vh.dtype) @ vh
            return out.transpose(1, 2)

        def flash_attn_qkvpacked_func(qkv, dropout_p=0.0,
                                      softmax_scale=None, causal=False):
            # qkv (B, S, 3, H, D)
            return flash_attn_func(qkv[:, :, 0], qkv[:, :, 1],
                                   qkv[:, :, 2], dropout_p,
                                   softmax_scale, causal)

        def flash_attn_varlen_func(q, k, v, cu_seqlens, max_seqlen,
                                   dropout_p=0.0, softmax_scale=None,
                                   causal=False):
            raise NotImplementedError("varlen flash stub not needed")

        rotary.apply_rotary_emb_qkv_ = apply_rotary_emb_qkv_
        rotary.apply_rotary_emb = flash_torch_apply_rotary_emb_torch
        iface.flash_attn_func = flash_attn_func
        iface.flash_attn_qkvpacked_func = flash_attn_qkvpacked_func
        iface.flash_attn_varlen_func = flash_attn_varlen_func
        iface.flash_attn_varlen_qkvpacked_func = \
            flash_attn_varlen_qkvpacked_func
        fa.layers = layers
        layers.rotary = rotary
        fa.flash_attn_interface = iface
        sys.modules["flash_attn"] = fa
        sys.modules["flash_attn.layers"] = layers
        sys.modules["flash_attn.layers.rotary"] = rotary
        sys.modules["flash_attn.flash_attn_interface"] = iface

    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")

        class OmegaConf:
            @staticmethod
            def create(d):
                return _to_namespace(d)

        om.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = om

    if "diffusers" not in sys.modules:
        # the production DIT (models/dit.py:12) imports exactly one symbol
        # from diffusers: get_2d_rotary_pos_embed_lumina. Re-implemented
        # here from the published diffusers math (axial 1D ropes of dim/2,
        # h/w interleaved as complex exponentials) so the reference class
        # constructs without the package.
        def get_1d_rotary_pos_embed(dim, pos, theta=10000.0,
                                    linear_factor=1.0, ntk_factor=1.0):
            theta = theta * ntk_factor
            freqs = (1.0 / (theta ** (torch.arange(0, dim, 2)[: dim // 2]
                                      .float() / dim)) / linear_factor)
            t = torch.arange(pos).float()
            fr = torch.outer(t, freqs)
            return torch.polar(torch.ones_like(fr), fr)   # (pos, dim//2)

        def get_2d_rotary_pos_embed_lumina(embed_dim, len_h, len_w,
                                           linear_factor=1.0,
                                           ntk_factor=1.0):
            assert embed_dim % 4 == 0
            emb_h = get_1d_rotary_pos_embed(embed_dim // 2, len_h,
                                            linear_factor=linear_factor,
                                            ntk_factor=ntk_factor)
            emb_w = get_1d_rotary_pos_embed(embed_dim // 2, len_w,
                                            linear_factor=linear_factor,
                                            ntk_factor=ntk_factor)
            emb_h = emb_h.view(len_h, 1, embed_dim // 4, 1).repeat(
                1, len_w, 1, 1)
            emb_w = emb_w.view(1, len_w, embed_dim // 4, 1).repeat(
                len_h, 1, 1, 1)
            return torch.cat([emb_h, emb_w], dim=-1).flatten(2)

        diffusers = types.ModuleType("diffusers")
        dmodels = types.ModuleType("diffusers.models")
        demb = types.ModuleType("diffusers.models.embeddings")
        demb.get_2d_rotary_pos_embed_lumina = get_2d_rotary_pos_embed_lumina
        demb.get_1d_rotary_pos_embed = get_1d_rotary_pos_embed
        diffusers.models = dmodels
        dmodels.embeddings = demb
        sys.modules["diffusers"] = diffusers
        sys.modules["diffusers.models"] = dmodels
        sys.modules["diffusers.models.embeddings"] = demb


def _to_namespace(d):
    if isinstance(d, dict):
        return types.SimpleNamespace(
            **{k: _to_namespace(v) for k, v in d.items()})
    return d


def extract_functions(path: str, names, extra_globals=None) -> dict:
    """Exec the named top-level function defs from a reference file.

    Returns a namespace dict containing the compiled functions. Decorators
    are kept (torch.inference_mode / torch.no_grad run fine on CPU).
    """
    with open(path) as f:
        src = f.read()
    import textwrap

    tree = ast.parse(src)
    wanted = set(names)
    segments = []

    def visit(body):
        for node in body:
            if isinstance(node, ast.FunctionDef) and node.name in wanted:
                segments.append(
                    textwrap.dedent(ast.get_source_segment(src, node)))
                wanted.discard(node.name)
            elif isinstance(node, (ast.ClassDef, ast.FunctionDef)):
                # recurse into classes AND function bodies — some reference
                # helpers are nested defs (e.g. get_similarity inside
                # zero_shot_eval_step, model_eval.py:268); their enclosing-
                # scope names (self, ...) become injectable globals
                visit(node.body)

    visit(tree.body)
    assert not wanted, f"functions not found in {path}: {sorted(wanted)}"

    import math

    import numpy as np
    import torch

    ns = {
        "torch": torch,
        "np": np,
        "math": math,
        "__builtins__": __builtins__,
        # no-op hooks the extracted functions may reference on gated paths
        "empty_device_cache": lambda *a, **k: None,
        "optional_add_bos": lambda self, out, x0=None: out,
        "rprint": lambda *a, **k: None,
        "print": lambda *a, **k: None,  # adap_sche prints per-row seq_len
    }
    if extra_globals:
        ns.update(extra_globals)
    for seg in segments:
        exec(compile(seg, path, "exec"), ns)
    return ns


class TorchShim:
    """Proxy for the `torch` name inside extracted reference functions that
    replaces the stochastic primitives with injectable versions so the
    same noise can be fed to our samplers (token-for-token parity; torch
    RNG streams are not reproducible cross-framework):

      * torch.multinomial        -> Gumbel-trick argmax on `exp_queue`
      * torch.rand_like          -> pops `rand_queue` (first-hitting)
      * torch.distributions.Gumbel(0,1).sample -> pops `gumbel_queue`
        (the AR sampler's precomputed noise, model_eval.py:2764)
    """

    def __init__(self, exp_queue, rand_queue=None, gumbel_queue=None,
                 int_queue=None):
        self._exp_queue = exp_queue
        self._rand_queue = rand_queue
        self._gumbel_queue = gumbel_queue
        self._int_queue = int_queue

    def randint(self, low, high, size=None, device=None, dtype=None):
        # torch.randint(low, high, size=...) — q_xt's uniform-corruption
        # draws (model.py:570-576); injectable like rand when an int
        # queue is provided, passthrough otherwise
        import torch
        if self._int_queue is None:
            return torch.randint(low, high, size=size, device=device,
                                 dtype=dtype or torch.int64)
        lo, hi, vals = self._int_queue.pop(0)
        assert (lo, hi) == (low, high), ((lo, hi), (low, high))
        assert tuple(vals.shape) == tuple(size), (vals.shape, size)
        return torch.as_tensor(vals, dtype=dtype or torch.int64)

    def multinomial(self, probs2d, num_samples):
        assert num_samples == 1
        import torch
        exp = self._exp_queue.pop(0).reshape(probs2d.shape)
        return (probs2d / torch.as_tensor(exp)).argmax(-1, keepdim=True)

    def rand_like(self, x, dtype=None, **kw):
        import torch
        assert self._rand_queue is not None, "no rand_queue injected"
        r = self._rand_queue.pop(0)
        assert tuple(r.shape) == tuple(x.shape), (r.shape, x.shape)
        return torch.as_tensor(r, dtype=dtype)

    def rand(self, *sizes, device=None, dtype=None):
        # torch.rand(*sizes) — used by q_xt (move/modality draws,
        # model.py:439,479-480) and _sample_t (model.py:593)
        import torch
        assert self._rand_queue is not None, "no rand_queue injected"
        r = self._rand_queue.pop(0)
        assert tuple(r.shape) == tuple(sizes), (r.shape, sizes)
        return torch.as_tensor(r, dtype=dtype or torch.float32)

    @property
    def distributions(self):
        import torch
        if self._gumbel_queue is None:
            return torch.distributions
        queue = self._gumbel_queue

        class _Gumbel:
            def __init__(self, loc, scale):
                assert (loc, scale) == (0, 1)

            def sample(self, shape):
                g = queue.pop(0)
                assert tuple(shape) == tuple(g.shape), (shape, g.shape)
                return torch.as_tensor(g, dtype=torch.float32)

        return types.SimpleNamespace(Gumbel=_Gumbel)

    def __getattr__(self, name):
        import torch
        return getattr(torch, name)


class NumpyShim:
    """Proxy for `np` that makes np.random.gumbel consume pre-drawn noise."""

    class _Random:
        def __init__(self, queue):
            self._queue = queue

        def gumbel(self, size=None):
            g = self._queue.pop(0)
            assert tuple(size) == tuple(g.shape), (size, g.shape)
            return g

        def __getattr__(self, name):
            import numpy as np
            return getattr(np.random, name)

    def __init__(self, gumbel_queue):
        self.random = NumpyShim._Random(gumbel_queue)

    def __getattr__(self, name):
        import numpy as np
        return getattr(np, name)
