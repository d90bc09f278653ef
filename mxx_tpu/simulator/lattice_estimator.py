"""Bridge to the external `lattice-estimator-cli` security estimator.

Reference: /root/reference/src/simulator/lattice_estimator.rs:12-260 — shells
out with JSON distribution specs and a timeout, parsing achieved security
bits. When the CLI is unavailable (this image has no network access), callers
get None and should fall back to parameter heuristics.
"""

from __future__ import annotations

import json
import shutil
import subprocess
from dataclasses import dataclass


@dataclass(frozen=True)
class LweDistSpec:
    """Distribution spec matching the CLI's JSON schema."""

    kind: str  # "gaussian" | "ternary" | "uniform" | "centered_binomial"
    sigma: float | None = None
    eta: int | None = None

    def to_json(self):
        out = {"kind": self.kind}
        if self.sigma is not None:
            out["sigma"] = self.sigma
        if self.eta is not None:
            out["eta"] = self.eta
        return out


def estimator_cli_available(binary: str = "lattice-estimator-cli") -> bool:
    return shutil.which(binary) is not None


def run_lattice_estimator_cli(
    ring_dimension: int,
    log_q: int,
    secret_dist: LweDistSpec,
    error_dist: LweDistSpec,
    timeout_secs: float = 600.0,
    binary: str = "lattice-estimator-cli",
) -> float | None:
    """Returns achieved security bits, or None if the CLI is missing/fails."""
    if not estimator_cli_available(binary):
        return None
    payload = json.dumps(
        {
            "n": ring_dimension,
            "log_q": log_q,
            "secret": secret_dist.to_json(),
            "error": error_dist.to_json(),
        }
    )
    try:
        proc = subprocess.run(
            [binary],
            input=payload.encode(),
            capture_output=True,
            timeout=timeout_secs,
        )
    except (subprocess.TimeoutExpired, OSError):
        return None
    if proc.returncode != 0:
        return None
    try:
        result = json.loads(proc.stdout.decode())
        return float(result["security_bits"])
    except (json.JSONDecodeError, KeyError, ValueError):
        return None


def heuristic_security_bits(ring_dimension: int, log_q: int) -> float:
    """Coarse fallback: the usual n*log(delta) LWE hardness rule of thumb
    (sigma ~ 3.2 ternary secret): secpar ~ 0.265 * n / log_q * ... — here we
    use the common `n / log_q * 2.6`-style linear estimate. For real parameter
    selection run the CLI."""
    return 2.6 * ring_dimension / max(log_q, 1)
