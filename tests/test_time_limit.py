"""time_limit guard: SIGALRM in the main thread, graceful no-op in workers.

The Trainer's host->device prefetch thread (train/trainer.py _prefetched)
pulls featurization through worker threads; before the fix, arming SIGALRM
there raised ``ValueError: signal only works in main thread`` which the
AR datamodule's except clause swallowed as "skipping <name>" — dropping
every training example (observed as train/loss=nan on the AR example run).
Reference analog: src/datamodules/components/ar_dataset.py:548-557.
"""

import threading
import time

import pytest

from gcpnet_tpu.utils.utils import TimeoutException, time_limit


def test_time_limit_raises_in_main_thread():
    with pytest.raises(TimeoutException):
        with time_limit(1):
            time.sleep(2)


def test_time_limit_passes_fast_work():
    with time_limit(5):
        x = sum(range(100))
    assert x == 4950


def test_time_limit_is_noop_guard_in_worker_thread():
    result = {}

    def worker():
        try:
            with time_limit(1):
                result["ok"] = True
        except Exception as exc:  # pragma: no cover - the bug path
            result["exc"] = exc

    t = threading.Thread(target=worker)
    t.start()
    t.join(10)
    assert result.get("ok") is True, f"worker failed: {result.get('exc')}"
