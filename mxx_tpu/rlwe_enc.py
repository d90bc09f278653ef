"""RLWE encryption helper: b = t*a + e + m * floor(q/2)
(reference /root/reference/src/rlwe_enc.rs:9-37)."""

from __future__ import annotations

from .matrix import PolyMatrix
from .ring.element import FinRingElem
from .ring.poly import Poly
from .sampler import GaussDist, UniformSampler


def rlwe_encrypt(
    params, sampler_uniform: UniformSampler, t: PolyMatrix, a: PolyMatrix, m: PolyMatrix,
    sigma: float,
) -> PolyMatrix:
    assert m.shape == (1, 1) and t.shape == (1, 1) and a.shape == (1, 1)
    e = sampler_uniform.sample_uniform(params, 1, 1, GaussDist(sigma))
    scale = Poly.from_elem_to_constant(params, FinRingElem.half_q(params.modulus))
    return t @ a + e + m.mul_poly_scalar(scale)
