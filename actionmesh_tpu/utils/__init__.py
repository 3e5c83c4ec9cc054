"""General utilities (counterpart of reference actionmesh/utils.py)."""

from __future__ import annotations

import gc
import logging
import os

logger = logging.getLogger(__name__)


def force_memory_cleanup() -> None:
    """Aggressive memory cleanup: GC + jax live-buffer/compile cache clear.

    Counterpart of reference force_memory_cleanup (utils.py:18-24). On TPU
    the lazy load/unload choreography is rarely needed (weights are bf16 and
    HBM-resident), but long-running servers can reclaim donated buffers and
    tracing caches here.
    """
    gc.collect()
    try:
        import jax

        jax.clear_caches()
    except Exception:  # pragma: no cover - jax always present in practice
        pass
    gc.collect()


def download_if_missing(repo_id: str, local_dir: str) -> str:
    """Download an HF Hub snapshot only if the local directory is empty.

    Counterpart of reference download_if_missing (utils.py:27-42). In
    air-gapped environments the download step is skipped with a warning —
    callers fall back to dev-mode random weights.
    """
    if os.path.exists(local_dir) and os.listdir(local_dir):
        return local_dir
    try:
        from huggingface_hub import snapshot_download

        snapshot_download(repo_id=repo_id, local_dir=local_dir)
    except Exception as e:
        logger.warning(
            "Could not download %s to %s (%s) — continuing without weights.",
            repo_id, local_dir, e,
        )
    return local_dir


def device_sync(x) -> None:
    """Force completion of a device computation by pulling one scalar.

    The axon TPU tunnel does NOT block on ``block_until_ready``; a tiny
    device->host transfer is the only reliable synchronization point, so
    stage timing wraps this (~30-60 ms of tunnel latency).
    """
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.ravel(x)[0].astype(jnp.float32))
