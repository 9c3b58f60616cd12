"""Process-zero-aware logging (reference src/utils/pylogger.py:10-21,
with jax.process_index() replacing Lightning's rank_zero_only)."""

from __future__ import annotations

import logging


def _is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


class _RankZeroFilter(logging.Filter):
    def filter(self, record):
        return _is_main_process()


def get_pylogger(name: str = __name__) -> logging.Logger:
    logger = logging.getLogger(name)
    if not any(isinstance(f, _RankZeroFilter) for f in logger.filters):
        logger.addFilter(_RankZeroFilter())
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("[%(asctime)s][%(name)s][%(levelname)s] %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger
