"""Round-3 oneshot-kernel variants: scratch-vs-recompute rotation,
bm 128 vs 256, direct-m2 encode (skip the codes detour).

Baseline oneshot (scratch, bm=128): 143.6 us at M=2048 K=5120.
"""
import os, sys, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qutlass_tpu.formats import codecs as C
from qutlass_tpu.kernels import quantize as KQ
from qutlass_tpu.ops import pallas_ops as P, int8path as I8
from qutlass_tpu.profiling import benchmark, chain_dep, tflops


def hadamard(n):
    hm = np.array([[1.0]])
    while hm.shape[0] < n:
        hm = np.block([[hm, hm], [hm, -hm]])
    return jnp.asarray(hm * n ** -0.5, jnp.bfloat16)


H32 = hadamard(32)
M, K = 2048, 5120
h128 = jnp.kron(jnp.eye(4, dtype=jnp.bfloat16), H32)


def _rot_chunk(x_ref, h, c0, w):
    """rotate x_ref[:, c0:c0+w] -> [w, bm] f32 (static offsets)."""
    bm = x_ref.shape[0]
    blocks = [lax.dot_general(h, x_ref[:, c0 + g * 128:c0 + (g + 1) * 128],
                              (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
              for g in range(w // 128)]
    return jnp.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]


def _m2_direct(q):
    """2 * RTNE(q to the e2m1 grid), float domain (f32 in/out)."""
    a = jnp.abs(q)
    a = jnp.where(jnp.isnan(a), 0.0, jnp.minimum(a, 6.0))
    r = jnp.where(a <= 2.0, lax.round(a * 2.0, lax.RoundingMethod.TO_NEAREST_EVEN),
                  jnp.where(a <= 4.0,
                            2.0 * lax.round(a, lax.RoundingMethod.TO_NEAREST_EVEN),
                            4.0 * lax.round(a * 0.5, lax.RoundingMethod.TO_NEAREST_EVEN)))
    return jnp.where(q < 0, -r, r)


def mk_shift_emit(bm, bkc):
    """Recompute-rotation variant with an INTEGER emit: the f32 rescale
    m2 * 2^(3-d) -> round -> i32 -> i8 chain is replaced by the exact
    integer shift m2 << (3-d) (d = e - byte in 0..3), saving the
    int->f32 cast, f32 mul, round and f32->i32 cast per element.
    Variable-distance vector shifts lower in this Mosaic (validated by
    the scaled decoders, benchmarks/tpu_recheck_r2s4 on-device)."""
    def kern(x_ref, h_ref, a_ref, s_ref, sa_ref, *, k):
        h = h_ref[...]
        byte_chunks = []
        for gb in range(k // bkc):
            xt = _rot_chunk(x_ref, h, gb * bkc, bkc)
            g = xt.reshape(bkc // 32, 32, bm)
            scale = C.mx_scale_quest(jnp.sum(g, axis=1),
                                     jnp.sum(g * g, axis=1), 32.0)
            _, byte = C.pow2_floor_e8m0(scale)
            byte_chunks.append(byte)
        byte = (jnp.concatenate(byte_chunks, axis=0) if len(byte_chunks) > 1
                else byte_chunks[0])
        e = jnp.max(byte, axis=0, keepdims=True)
        inv = C.e8m0_recip_f32(byte)
        sh = (3 - (e - byte))                        # i32 [k/32, bm], 0..3
        s_ref[...] = byte.astype(jnp.uint8)
        sa_ref[...] = jnp.exp2((e - 131).astype(jnp.float32))
        gc = bkc // 32
        for c in range(k // bkc):
            xt = _rot_chunk(x_ref, h, c * bkc, bkc)
            q = (xt.reshape(gc, 32, bm) * inv[c * gc:(c + 1) * gc][:, None, :]
                 ).reshape(bkc, bm)
            m2 = C.e2m1_codes_to_m2(C.e2m1_rtne_codes(q))
            a = (m2.reshape(gc, 32, bm)
                 << sh[c * gc:(c + 1) * gc][:, None, :]).reshape(bkc, bm)
            a_ref[c * bkc:(c + 1) * bkc, :] = a.astype(jnp.int8)

    return pl.pallas_call(
        functools.partial(kern, k=K),
        grid=(M // bm,),
        in_specs=[pl.BlockSpec((bm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((128, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((K, bm), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((K // 32, bm), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, bm), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((K, M), jnp.int8),
                   jax.ShapeDtypeStruct((K // 32, M), jnp.uint8),
                   jax.ShapeDtypeStruct((1, M), jnp.float32)],
    )


def mk_recompute(bm, bkc, direct_m2):
    def kern(x_ref, h_ref, a_ref, s_ref, sa_ref, *, k):
        h = h_ref[...]
        byte_chunks = []
        for gb in range(k // bkc):
            xt = _rot_chunk(x_ref, h, gb * bkc, bkc)
            g = xt.reshape(bkc // 32, 32, bm)
            scale = C.mx_scale_quest(jnp.sum(g, axis=1),
                                     jnp.sum(g * g, axis=1), 32.0)
            _, byte = C.pow2_floor_e8m0(scale)
            byte_chunks.append(byte)
        byte = jnp.concatenate(byte_chunks, axis=0)
        e = jnp.max(byte, axis=0, keepdims=True)
        inv = C.e8m0_recip_f32(byte)
        f = jnp.exp2((3 - (e - byte)).astype(jnp.float32))
        s_ref[...] = byte.astype(jnp.uint8)
        sa_ref[...] = jnp.exp2((e - 131).astype(jnp.float32))
        gc = bkc // 32
        for c in range(k // bkc):
            xt = _rot_chunk(x_ref, h, c * bkc, bkc)
            q = (xt.reshape(gc, 32, bm) * inv[c * gc:(c + 1) * gc][:, None, :]
                 ).reshape(bkc, bm)
            if direct_m2:
                m2 = _m2_direct(q)
            else:
                m2 = C.e2m1_codes_to_m2(C.e2m1_rtne_codes(q)
                                        ).astype(jnp.float32)
            a = jnp.round((m2.reshape(gc, 32, bm)
                           * f[c * gc:(c + 1) * gc][:, None, :]
                           ).reshape(bkc, bm))
            a_ref[c * bkc:(c + 1) * bkc, :] = a.astype(jnp.int32
                                                       ).astype(jnp.int8)

    return pl.pallas_call(
        functools.partial(kern, k=K),
        grid=(M // bm,),
        in_specs=[pl.BlockSpec((bm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((128, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((K, bm), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((K // 32, bm), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, bm), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((K, M), jnp.int8),
                   jax.ShapeDtypeStruct((K // 32, M), jnp.uint8),
                   jax.ShapeDtypeStruct((1, M), jnp.float32)],
    )


def mk_scratch_m2(bm, bkc):
    """scratch variant but with direct m2 in pass B."""
    def kern(x_ref, h_ref, a_ref, s_ref, sa_ref, xt_s, *, k):
        h = h_ref[...]
        byte_chunks = []
        for gb in range(k // 128):
            xt = _rot_chunk(x_ref, h, gb * 128, 128)
            xt_s[gb * 128:(gb + 1) * 128, :] = xt
            g = xt.reshape(4, 32, bm)
            scale = C.mx_scale_quest(jnp.sum(g, axis=1),
                                     jnp.sum(g * g, axis=1), 32.0)
            _, byte = C.pow2_floor_e8m0(scale)
            byte_chunks.append(byte)
        byte = jnp.concatenate(byte_chunks, axis=0)
        e = jnp.max(byte, axis=0, keepdims=True)
        inv = C.e8m0_recip_f32(byte)
        f = jnp.exp2((3 - (e - byte)).astype(jnp.float32))
        s_ref[...] = byte.astype(jnp.uint8)
        sa_ref[...] = jnp.exp2((e - 131).astype(jnp.float32))
        gc = bkc // 32
        for c in range(k // bkc):
            xt = xt_s[c * bkc:(c + 1) * bkc, :]
            q = (xt.reshape(gc, 32, bm) * inv[c * gc:(c + 1) * gc][:, None, :]
                 ).reshape(bkc, bm)
            m2 = _m2_direct(q)
            a = jnp.round((m2.reshape(gc, 32, bm)
                           * f[c * gc:(c + 1) * gc][:, None, :]
                           ).reshape(bkc, bm))
            a_ref[c * bkc:(c + 1) * bkc, :] = a.astype(jnp.int32
                                                       ).astype(jnp.int8)

    return pl.pallas_call(
        functools.partial(kern, k=K),
        grid=(M // bm,),
        in_specs=[pl.BlockSpec((bm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((128, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((K, bm), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((K // 32, bm), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, bm), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((K, M), jnp.int8),
                   jax.ShapeDtypeStruct((K // 32, M), jnp.uint8),
                   jax.ShapeDtypeStruct((1, M), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((K, bm), jnp.float32)],
    )


a0 = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
params = {"a": a0}

# reference output for bitwise check
ref_ai, ref_sa, ref_sb = KQ.fused_quantize_mx_int8(a0, H32, rot_size=32,
                                                   method="quest")

variants = [
    ("recomp_bm128", mk_recompute(128, 512, False)),
    ("recomp_bm256", mk_recompute(256, 512, False)),
    ("recomp_m2_128", mk_recompute(128, 512, True)),
    ("recomp_m2_256", mk_recompute(256, 512, True)),
    ("scratch_m2", mk_scratch_m2(128, 512)),
    ("shift_bm128", mk_shift_emit(128, 512)),
    ("shift_bm256", mk_shift_emit(256, 512)),
    ("shift_bm512", mk_shift_emit(512, 512)),
]
for name, fn in variants:
    try:
        ai, sb, sa = fn(a0, h128)
        ok = (np.array_equal(np.asarray(ai), np.asarray(ref_ai))
              and np.array_equal(np.asarray(sa).ravel(), np.asarray(ref_sa))
              and np.array_equal(np.asarray(sb), np.asarray(ref_sb)))
        def bench_fn(d, j, p, fn=fn):
            x = chain_dep(p["a"], d)
            ai, sb, sa = fn(x, h128)
            return ai.astype(jnp.float32).sum() + sa.sum()
        t = min(benchmark(bench_fn, repeats=3, params=params) for _ in range(2))
        print(f"{name:14s} {t*1e6:7.1f} us  bitwise={'OK' if ok else 'MISMATCH'}",
              flush=True)
    except Exception as e:
        print(f"{name:14s} FAILED: {str(e)[:200]}", flush=True)
