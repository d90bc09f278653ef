"""MP12 gadget trapdoor generation and preimage sampling.

TPU-native build of the reference's trapdoor stack
(/root/reference/src/sampler/trapdoor/{mod.rs,sampler.rs}; CUDA
cuda/src/matrix/MatrixTrapdoor.cu):

- Trapdoor: R, E ~ D_{Z,sigma}^{d x dk}; public A = [A_bar | I | G - (A_bar R + E)].
- Preimage of target U: sample perturbation p_hat, compute the perturbed
  syndrome V = U - A p_hat, solve G z = V on the G-lattice, then output
  [p1 + R z ; p2 + E z ; p3 + z] so that A x = U exactly.

Constants follow the reference: SPECTRAL_CONSTANT = 1.8, c = (b+1) sigma,
s = 1.8 (b+1) sigma^2 (sqrt(d n k) + sqrt(2n) + 4.7)
(trapdoor/sampler.rs:23-37).

Round-1 simplifications (functional identity A x = U and the norm scale are
exact; the *distribution* is approximate — TODO Genise-Micciancio exact
samplers):
- G-lattice solve uses the deterministic digit decomposition G^{-1}(V)
  instead of a randomized Gaussian coset sample (gauss_samp_gq_arb_base).
- The perturbation is spherical D_{Z, sqrt(s^2-c^2)} without the
  [R;E]-covariance correction (SampleP1ForPertMat).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from ..matrix import PolyMatrix
from ..ring.params import RingParams
from .dist import FinRingDist, GaussDist
from .samplers import UniformSampler

SPECTRAL_CONSTANT = 1.8


def preimage_c(base: int, sigma: float) -> float:
    return (base + 1.0) * sigma


def preimage_smoothing_parameter(base: int, sigma: float, d: int, n: int, k: int) -> float:
    return (
        SPECTRAL_CONSTANT
        * (base + 1.0)
        * sigma
        * sigma
        * (math.sqrt(d * n * k) + math.sqrt(2 * n) + 4.7)
    )


@dataclass(frozen=True)
class Trapdoor:
    """Trapdoor (R, E) plus cached Gram blocks (reference DCRTTrapdoor
    {r, e, a_mat=RR^T, b_mat=RE^T, d_mat=EE^T, re}, trapdoor/mod.rs:72-112)."""

    r: PolyMatrix
    e: PolyMatrix

    @property
    def re(self) -> PolyMatrix:
        return self.r.concat_rows([self.e])

    def a_mat(self) -> PolyMatrix:
        return self.r @ self.r.transpose()

    def b_mat(self) -> PolyMatrix:
        return self.r @ self.e.transpose()

    def d_mat(self) -> PolyMatrix:
        return self.e @ self.e.transpose()

    def to_compact_bytes(self) -> bytes:
        parts = [self.r.to_compact_bytes(), self.e.to_compact_bytes()]
        out = b""
        for p in parts:
            out += len(p).to_bytes(8, "little") + p
        return out

    @staticmethod
    def from_compact_bytes(params: RingParams, raw: bytes) -> "Trapdoor":
        mats = []
        off = 0
        for _ in range(2):
            ln = int.from_bytes(raw[off : off + 8], "little")
            off += 8
            mats.append(PolyMatrix.from_compact_bytes(params, raw[off : off + ln]))
            off += ln
        return Trapdoor(r=mats[0], e=mats[1])


class TrapdoorSampler:
    """Reference `DCRTPolyTrapdoorSampler` (trapdoor/sampler.rs:40-225)."""

    def __init__(self, params: RingParams, sigma: float, seed: int | None = None):
        self.sigma = sigma
        self.base = 1 << params.base_bits
        self.c = preimage_c(self.base, sigma)
        self._uniform = UniformSampler(seed)

    def trapdoor(self, params: RingParams, size: int) -> tuple[Trapdoor, PolyMatrix]:
        d = size
        k = params.modulus_digits
        gauss = GaussDist(self.sigma)
        r = self._uniform.sample_uniform(params, d, d * k, gauss)
        e = self._uniform.sample_uniform(params, d, d * k, gauss)
        a_bar = self._uniform.sample_uniform(params, d, d, FinRingDist())
        g = PolyMatrix.gadget_matrix(params, d)
        a0 = a_bar.concat_columns([PolyMatrix.identity(params, d)])
        a1 = g - (a_bar @ r + e)
        a = a0.concat_columns([a1])
        return Trapdoor(r=r, e=e), a

    def preimage(
        self,
        params: RingParams,
        trapdoor: Trapdoor,
        public_matrix: PolyMatrix,
        target: PolyMatrix,
    ) -> PolyMatrix:
        d = public_matrix.nrow
        assert target.nrow == d, "target rows must match public matrix rows"
        cols = target.ncol
        n = params.n
        k = params.modulus_digits
        s = preimage_smoothing_parameter(self.base, self.sigma, d, n, k)
        sigma_large = math.sqrt(max(s * s - self.c * self.c, 1.0))
        p_hat = self._uniform.sample_uniform(
            params, d * (k + 2), cols, GaussDist(sigma_large)
        )
        syndrome = target - public_matrix @ p_hat
        z = syndrome.decompose()  # [d*k, cols]; G z == syndrome (mod q)
        rz = trapdoor.r @ z
        ez = trapdoor.e @ z
        top = p_hat.slice_rows(0, d) + rz
        mid = p_hat.slice_rows(d, 2 * d) + ez
        bot = p_hat.slice_rows(2 * d, d * (k + 2)) + z
        return top.concat_rows([mid, bot])

    def preimage_extend(
        self,
        params: RingParams,
        trapdoor: Trapdoor,
        public_matrix: PolyMatrix,
        ext_matrix: PolyMatrix,
        target: PolyMatrix,
    ) -> PolyMatrix:
        """Algorithm 5 of eprint 2017/601: preimage for [B | C] x = U
        (reference trapdoor/sampler.rs:199-222)."""
        d = public_matrix.nrow
        k = params.modulus_digits
        s = preimage_smoothing_parameter(self.base, self.sigma, d, params.n, k)
        pre_right = self._uniform.sample_uniform(
            params, ext_matrix.ncol, target.ncol, GaussDist(s)
        )
        t = target - ext_matrix @ pre_right
        pre_left = self.preimage(params, trapdoor, public_matrix, t)
        return pre_left.concat_rows([pre_right])
