"""Overwatch — rank-0-gated rich logging.

Reference: ``models/cobra/overwatch.py`` (Rich handler + accelerate
PartialState, rank-0-only INFO, context indent adapter, distributed-vs-pure
auto-select by WORLD_SIZE :112-113). The JAX analog gates on
``jax.process_index() == 0`` and needs no accelerate.
"""

from __future__ import annotations

import logging
import os
import sys

RICH_FORMAT = "| >> %(message)s"
DATEFMT = "%m/%d [%H:%M:%S]"
CTX_PREFIXES = {0: "[*] ", 1: "[=>] ", 2: "[->] ", 3: "[>] "}


class _ContextAdapter(logging.LoggerAdapter):
    def process(self, msg, kwargs):
        ctx_level = kwargs.pop("ctx_level", 0)
        return f"{CTX_PREFIXES.get(ctx_level, '')}{msg}", kwargs


class Overwatch:
    """Rank-0 gated logger with the reference's ctx_level API."""

    def __init__(self, name: str):
        self.logger = _ContextAdapter(logging.getLogger(name), extra={})
        self.logger.logger.setLevel(logging.INFO if self.rank() == 0 else logging.ERROR)

    @staticmethod
    def rank() -> int:
        try:
            import jax

            return jax.process_index()
        except Exception:
            return int(os.environ.get("RANK", 0))

    @staticmethod
    def world_size() -> int:
        try:
            import jax

            return jax.process_count()
        except Exception:
            return int(os.environ.get("WORLD_SIZE", 1))

    def is_rank_zero(self) -> bool:
        return self.rank() == 0

    def info(self, msg: str, ctx_level: int = 0):
        self.logger.info(msg, ctx_level=ctx_level)

    def warning(self, msg: str, ctx_level: int = 0):
        self.logger.warning(msg, ctx_level=ctx_level)

    def error(self, msg: str, ctx_level: int = 0):
        self.logger.error(msg, ctx_level=ctx_level)

    def debug(self, msg: str, ctx_level: int = 0):
        self.logger.debug(msg, ctx_level=ctx_level)


_INITIALIZED = False


def initialize_overwatch(name: str) -> Overwatch:
    """Module-level factory (reference overwatch.py:initialize_overwatch)."""
    global _INITIALIZED
    if not _INITIALIZED:
        try:
            from rich.logging import RichHandler

            handler = RichHandler(markup=True, rich_tracebacks=True)
            logging.basicConfig(
                level=logging.INFO, format=RICH_FORMAT, datefmt=DATEFMT,
                handlers=[handler], force=False,
            )
        except ImportError:
            logging.basicConfig(
                level=logging.INFO,
                format="%(asctime)s " + RICH_FORMAT,
                datefmt=DATEFMT,
                stream=sys.stdout,
            )
        _INITIALIZED = True
    return Overwatch(name)
