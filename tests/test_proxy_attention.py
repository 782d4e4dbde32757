"""Fused proxy-attention kernel: parity with the masked XLA path + VJP.

Runs the Pallas kernel in interpret mode on the CPU test mesh; the real-TPU
speed is benchmarked in tools/bench_report.py / PERF.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpretrain_tpu.models.clip_vip.model import proxy_attention_mask
from xpretrain_tpu.models.common import dot_attention
from xpretrain_tpu.ops.proxy_attention import (
    _attention_xla,
    proxy_flash_attention,
)

M, N, L, D, H, B = 3, 4, 13, 16, 2, 2
S = M + N * L


@pytest.fixture()
def qkv():
    rng = np.random.default_rng(0)
    shape = (B, H, S, D)
    return tuple(jnp.asarray(rng.normal(size=shape).astype(np.float32)) for _ in range(3))


def test_xla_path_matches_masked_dot_attention(qkv):
    q, k, v = qkv
    mask = jnp.asarray(proxy_attention_mask(M, N, L))
    want = dot_attention(q, k, v, D**-0.5, mask)
    got = _attention_xla(q, k, v, M, L, D**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pallas_kernel_matches_xla(qkv):
    q, k, v = qkv
    want = _attention_xla(q, k, v, M, L, D**-0.5)
    got = proxy_flash_attention(q, k, v, M, N, L, D**-0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_custom_vjp_matches_autodiff(qkv):
    q, k, v = qkv

    def loss_flash(q, k, v):
        out = proxy_flash_attention(q, k, v, M, N, L, D**-0.5, interpret=True)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v):
        mask = jnp.asarray(proxy_attention_mask(M, N, L))
        out = dot_attention(q, k, v, D**-0.5, mask)
        return jnp.sum(out * jnp.cos(out))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, err_msg=f"d{name}"
        )


def test_mask_semantics_patch_isolation(qkv):
    """A patch token must be unaffected by patches of OTHER frames."""
    q, k, v = qkv
    out1 = proxy_flash_attention(q, k, v, M, N, L, D**-0.5, interpret=True)
    # perturb frame 3's patches; frame 0's outputs must not move
    k2 = k.at[:, :, M + 3 * L :].add(5.0)
    v2 = v.at[:, :, M + 3 * L :].add(5.0)
    out2 = proxy_flash_attention(q, k2, v2, M, N, L, D**-0.5, interpret=True)
    f0 = slice(M, M + L)
    np.testing.assert_allclose(
        np.asarray(out1[:, :, f0]), np.asarray(out2[:, :, f0]), atol=1e-6
    )
    # but the proxies (which see everything) must move
    assert np.abs(np.asarray(out1[:, :, :M]) - np.asarray(out2[:, :, :M])).max() > 1e-3


def test_packed_kernel_matches_xla(qkv):
    """The packed [B,S,H·D]-layout kernel (v3: no HBM layout transposes)
    must be numerically identical to the [B,H,S,D] path, fwd and bwd."""
    from xpretrain_tpu.ops.proxy_attention import proxy_flash_attention_packed

    q, k, v = qkv
    pack = lambda x: x.transpose(0, 2, 1, 3).reshape(B, S, H * D)
    want = pack(_attention_xla(q, k, v, M, L, D**-0.5))
    got = proxy_flash_attention_packed(
        pack(q), pack(k), pack(v), M, N, L, D**-0.5, D, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def loss_packed(q, k, v):
        out = proxy_flash_attention_packed(
            q, k, v, M, N, L, D**-0.5, D, interpret=True
        )
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(qp, kp, vp):
        split = lambda x: x.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        out = pack(_attention_xla(split(qp), split(kp), split(vp), M, L, D**-0.5))
        return jnp.sum(out * jnp.cos(out))

    args = (pack(q), pack(k), pack(v))
    g_packed = jax.grad(loss_packed, argnums=(0, 1, 2))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for a, b, name in zip(g_packed, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, err_msg=f"d{name}"
        )


def test_head_group_packed_pins():
    """Packed kernels run under a raised per-kernel scoped-VMEM limit
    (``CompilerParams(vmem_limit_bytes=96 MiB)``) with a ~64 B/elem stack
    model (29.07 MiB reported by Mosaic at HG=12, S=592). Pin the shipped
    head-group picks for the three reference variants so a constant edit
    can't silently re-break compile."""
    from xpretrain_tpu.ops.proxy_attention import (
        _PACKED_STACK_BYTES_PER_ELEM,
        _PACKED_STACK_LIMIT_BYTES,
        _head_group_packed,
    )

    assert _head_group_packed(12, 592, 64, n_bufs=4) == 12  # B/32 fwd: full
    assert _head_group_packed(12, 2356, 64, n_bufs=4) == 6  # B/16 fwd
    assert _head_group_packed(16, 3076, 64, n_bufs=4) == 4  # L/14 fwd
    for H, S in ((12, 592), (12, 2356), (16, 3076)):
        hg = _head_group_packed(H, S, 64, n_bufs=16)  # bwd picker
        assert hg >= 1
        assert (
            _PACKED_STACK_BYTES_PER_ELEM * hg * S * 64 <= _PACKED_STACK_LIMIT_BYTES
        )


def test_head_group_respects_vmem_stack_cap():
    """B/16's S=2356 blew the 16 MiB scoped-VMEM stack at HG=6 (compile-time
    failure, past the Python fallback). The picker must cap HG by the
    empirical ~32·HG·S·D-byte stack model while keeping B/32 at full HG."""
    from xpretrain_tpu.ops.proxy_attention import (
        _STACK_BYTES_PER_ELEM,
        _STACK_LIMIT_BYTES,
        _head_group,
    )

    hg_b32 = _head_group(12, 4 + 12 * 49, 64, n_bufs=4)
    assert hg_b32 == 12  # unchanged: full head batching at B/32
    hg_b16 = _head_group(12, 4 + 12 * 196, 64, n_bufs=4)
    assert hg_b16 <= 3
    assert _STACK_BYTES_PER_ELEM * hg_b16 * (4 + 12 * 196) * 64 <= _STACK_LIMIT_BYTES
    # bwd picker also bounded
    assert _head_group(12, 4 + 12 * 196, 64, n_bufs=16) >= 1
    # regression pin: the exact shipped values for the three reference
    # variants (B/32 S=592, B/16 S=2356, L/14 S=3076) — a budget-constant
    # edit that silently re-breaks B/16/L/14 compile must fail here
    assert _head_group(12, 592, 64, n_bufs=4) == 12
    assert _head_group(12, 2356, 64, n_bufs=4) == 3
    assert _head_group(16, 3076, 64, n_bufs=4) == 2
