"""Phase tracing spans: the reference's `tracing` crate equivalent.

The reference logs debug!/info! events with elapsed_ms at every protocol
phase (src/io/diamond_io.rs:243-1300, src/sampler/trapdoor/sampler.rs:98).
This module is the stdlib-`logging` analog: `span("phase", key=val)` logs
entry at DEBUG and exit with elapsed_ms at INFO under the "mxx_tpu" logger.

Enable with e.g.::

    import logging
    logging.getLogger("mxx_tpu").setLevel(logging.INFO)
    logging.basicConfig()

or MXX_TRACE=1 in the environment (installs a stderr handler at import).
Spans are ~no-op (one isEnabledFor check) when the logger is disabled.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

logger = logging.getLogger("mxx_tpu")

if os.environ.get("MXX_TRACE"):
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.DEBUG if os.environ.get("MXX_TRACE") == "2" else logging.INFO)


def _fmt_fields(fields: dict) -> str:
    return " ".join(f"{k}={v}" for k, v in fields.items())


@contextlib.contextmanager
def span(name: str, **fields):
    """Timed phase span; logs `name started` (DEBUG) and `name finished
    elapsed_ms=...` (INFO). Yields a dict that callers may add exit fields to."""
    if not logger.isEnabledFor(logging.INFO):
        yield {}
        return
    if logger.isEnabledFor(logging.DEBUG):
        logger.debug("%s started %s", name, _fmt_fields(fields))
    started = time.monotonic()
    exit_fields: dict = {}
    try:
        yield exit_fields
    finally:
        elapsed_ms = (time.monotonic() - started) * 1e3
        merged = {**fields, **exit_fields}
        logger.info("%s finished elapsed_ms=%.1f %s", name, elapsed_ms, _fmt_fields(merged))


def event(name: str, **fields):
    """One-shot INFO event."""
    if logger.isEnabledFor(logging.INFO):
        logger.info("%s %s", name, _fmt_fields(fields))
