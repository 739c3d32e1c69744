"""QAT step component profile (m=n=k=4096, the bench_qat shape).

Times each piece of the quartet fwd+bwd against the pseudoquant
baseline's pieces to locate the 0.8x residual.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import qutlass_tpu as q
from qutlass_tpu.nn.linear import _quartet_fwd_impl, _unrotate, _unpack_mask_bits
from qutlass_tpu.ops import int8path as I8
from qutlass_tpu.profiling import benchmark, chain_dep, enable_compile_cache

enable_compile_cache()
M = N = K = 4096
one = jnp.ones((1,), jnp.float32)


def main():
    rng = np.random.default_rng(0)
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((N, K)) * 0.05, jnp.bfloat16)
    gy = jnp.asarray(rng.standard_normal((M, N)), jnp.bfloat16)

    _, (xqt, xst, mask_t, wqt, wst) = _quartet_fwd_impl(x, w, h, "quest")
    gq_s0 = q.backward_square_double_scaled(gy)
    w8_s0 = q.mxfp4_transpose_scaled_kmajor(wqt, wst)
    params = {"x": x, "w": w, "gy": gy, "xqt": xqt, "xst": xst,
              "mask": mask_t, "wqt": wqt, "wst": wst, "gq": gq_s0,
              "w8": w8_s0}

    def dep_bf16(a, d):
        return chain_dep(a, d)

    cases = {}

    cases["fwd total"] = lambda d, p: _quartet_fwd_impl(
        dep_bf16(p["x"], d), p["w"], h, "quest")[0]
    cases["fwd quantize x (mask)"] = lambda d, p: q.fusedQuantizeMx(
        dep_bf16(p["x"], d), h, method="quest", return_mask=True,
        layout="kmajor")[0]
    cases["fwd quantize w"] = lambda d, p: q.fusedQuantizeMx(
        dep_bf16(p["w"], d), h, method="quest", layout="kmajor")[0]

    def enc(d, p):
        qt = jnp.maximum(p["xqt"], (d.reshape(()) * 1e-30).astype(jnp.uint8))
        return I8.encode_int8(qt, p["xst"], kmajor=True)[0]
    cases["fwd encode (packed in)"] = enc

    def int8dot(d, p):
        ai, sa, _ = I8.encode_int8(p["xqt"], p["xst"], kmajor=True)
        dd = d.reshape(()).astype(jnp.float32)
        ai = jnp.maximum(ai, (dd * 1e-30 - 127).astype(jnp.int8))
        wi, sw, _ = I8.encode_int8(p["wqt"], p["wst"], kmajor=True)
        return I8.matmul_mxf4_bf16_int8_kmajor(ai, wi.T, sa, sw, one)
    cases["fwd 2x encode + int8 dot"] = int8dot

    cases["bwd square_double"] = lambda d, p: q.backward_square_double_scaled(
        dep_bf16(p["gy"], d))
    cases["bwd transpose_scaled (w)"] = lambda d, p: \
        q.mxfp4_transpose_scaled_kmajor(
            jnp.maximum(p["wqt"], (d.reshape(()) * 1e-30).astype(jnp.uint8)),
            p["wst"])

    def dgrad(d, p):
        return jax.lax.dot_general(dep_bf16(p["gq"], d), p["w8"],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16)
    cases["bwd dgrad dot"] = dgrad

    def maskmul(d, p):
        dxh = dep_bf16(p["gq"][:M, :K], d)
        return (dxh.astype(jnp.float32)
                * _unpack_mask_bits(p["mask"].T, K)).astype(jnp.bfloat16)
    cases["bwd mask unpack+mul"] = maskmul

    cases["bwd unrotate"] = lambda d, p: _unrotate(
        dep_bf16(p["gq"][:M, :K], d).astype(jnp.float32), h
        ).astype(jnp.bfloat16)

    def bf16dot(d, p):
        return jax.lax.dot_general(dep_bf16(p["gy"], d), p["w"],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    cases["plain bf16 dot (baseline unit)"] = bf16dot

    for name, op in cases.items():
        try:
            t = benchmark(op, params=params)
            print(f"{name:34s} {t*1e6:9.1f} us", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {repr(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
