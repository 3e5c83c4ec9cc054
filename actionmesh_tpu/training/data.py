"""Training data pipeline: clip datasets, window batching, async prefetch.

The reference ships no training code, hence no data loader (SURVEY.md §4).
This module supplies the TPU-idiomatic input path for the trainers in
training/flow_train.py: host-side numpy batch assembly on a background
thread, overlapped with device compute through a bounded queue of batches
already transferred with ``jax.device_put`` under the mesh's batch
sharding — the dominant host→HBM copy rides the previous step's compute.

On-disk format: one ``.npz`` per clip with

  * ``latents``   (T_clip, N, C)  clean Stage-I latents (VAE-encoded video)
  * ``context``   (T_clip, S, D)  per-frame DINOv2 features
  * ``framestep`` (T_clip,)       real video timesteps (seconds or frames)

i.e. exactly what ``ActionMeshPipeline`` Stage I consumes per window
(pipeline.py), so an inference pass over raw videos doubles as the
dataset-preparation pass. Training examples are length-``window`` frame
slices; the first ``n_cond_frames`` of each slice are marked as
ground-truth conditioning (mask 1), mirroring the sampler's anchor-frame
freeze (sampling/denoise_loop.py).
"""

from __future__ import annotations

from collections import OrderedDict

import queue
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Optional

import jax
import numpy as np


def write_clip(
    path: str | Path,
    latents: np.ndarray,
    context: np.ndarray,
    framestep: np.ndarray,
) -> None:
    """Write one training clip in the canonical npz layout."""
    latents = np.asarray(latents)
    context = np.asarray(context)
    framestep = np.asarray(framestep)
    if latents.ndim != 3 or context.ndim != 3 or framestep.ndim != 1:
        raise ValueError(
            f"clip arrays must be (T,N,C)/(T,S,D)/(T,): got "
            f"{latents.shape}/{context.shape}/{framestep.shape}"
        )
    if not (latents.shape[0] == context.shape[0] == framestep.shape[0]):
        raise ValueError(
            f"frame-count mismatch: latents T={latents.shape[0]}, "
            f"context T={context.shape[0]}, framestep T={framestep.shape[0]}"
        )
    np.savez(path, latents=latents, context=context, framestep=framestep)


def synthesize_clip_dir(
    out_dir: str | Path,
    *,
    n_clips: int = 4,
    frames: int = 8,
    tokens: int = 8,
    channels: int = 4,
    context_tokens: int = 3,
    context_dim: int = 16,
    seed: int = 0,
) -> Path:
    """Generate a deterministic synthetic clip directory for tests/smoke
    training: low-rank latents moving smoothly in time (a learnable signal,
    not white noise) with matching per-frame context features."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n_clips):
        base = rng.normal(size=(tokens, channels)).astype(np.float32)
        drift = rng.normal(size=(tokens, channels)).astype(np.float32)
        t = np.linspace(0.0, 1.0, frames, dtype=np.float32)[:, None, None]
        latents = base[None] * np.cos(2 * np.pi * t) + drift[None] * t
        context = rng.normal(
            size=(frames, context_tokens, context_dim)
        ).astype(np.float32) * 0.5
        framestep = np.arange(frames, dtype=np.float32)
        write_clip(out / f"clip_{i:04d}.npz", latents, context, framestep)
    return out


@dataclass(frozen=True)
class _Window:
    clip: Path
    start: int


class ClipWindowDataset:
    """Index of fixed-length frame windows over a directory of clip npz
    files. Windows are strided slices; clips shorter than ``window`` are
    skipped (with a count exposed as ``skipped_clips``)."""

    def __init__(self, data_dir: str | Path, window: int, stride: int = 1):
        if window < 1 or stride < 1:
            raise ValueError(f"window={window} and stride={stride} must be >= 1")
        self.data_dir = Path(data_dir)
        self.window = window
        clips = sorted(self.data_dir.glob("*.npz"))
        if not clips:
            raise FileNotFoundError(f"no .npz clips under {self.data_dir}")
        self._windows: list[_Window] = []
        self.skipped_clips = 0
        for clip in clips:
            with np.load(clip) as z:
                frames = z["latents"].shape[0]
            if frames < window:
                self.skipped_clips += 1
                continue
            for start in range(0, frames - window + 1, stride):
                self._windows.append(_Window(clip, start))
        if not self._windows:
            raise ValueError(
                f"no clip under {self.data_dir} has >= {window} frames"
            )
        # small LRU of decoded clips: flow_batches shuffles windows across
        # clips, so a single-clip cache would miss on nearly every access
        # and re-decompress a whole clip per SAMPLE (r5 review); a few
        # clips cover a shuffled batch's typical working set
        self._cache: "OrderedDict[Path, dict]" = OrderedDict()
        self._cache_clips = 8

    def __len__(self) -> int:
        return len(self._windows)

    def _load(self, path: Path) -> dict:
        hit = self._cache.get(path)
        if hit is not None:
            self._cache.move_to_end(path)
            return hit
        with np.load(path) as z:
            clip = {k: z[k] for k in ("latents", "context", "framestep")}
        self._cache[path] = clip
        if len(self._cache) > self._cache_clips:
            self._cache.popitem(last=False)
        return clip

    def __getitem__(self, idx: int) -> dict:
        w = self._windows[idx]
        clip = self._load(w.clip)
        sl = slice(w.start, w.start + self.window)
        return {
            "latents": clip["latents"][sl],
            "context": clip["context"][sl],
            "framestep": clip["framestep"][sl],
        }


def split_windows(dataset, eval_fraction: float = 0.1, seed: int = 0):
    """Random disjoint train/eval split of a window dataset
    (ClipWindowDataset or DecoderTrackDataset). Returns (train, eval)
    lightweight views sharing the underlying files."""
    import copy

    n = len(dataset)
    n_eval = max(1, int(round(n * eval_fraction)))
    if n_eval >= n:
        raise ValueError(
            f"eval_fraction={eval_fraction} leaves no training windows "
            f"(dataset has {n})"
        )
    order = np.random.default_rng(seed).permutation(n)

    def view(indices):
        v = copy.copy(dataset)
        v._windows = [dataset._windows[int(i)] for i in sorted(indices)]
        for attr in ("_cache", "_cache_path", "_cache_key"):
            if hasattr(v, attr):
                setattr(v, attr, None)
        return v

    return view(order[n_eval:]), view(order[:n_eval])


def flow_batches(
    dataset: ClipWindowDataset,
    batch_size: int,
    *,
    seed: int = 0,
    n_cond_frames: "int | tuple[int, int]" = 1,
    epochs: Optional[int] = None,
) -> Iterator[dict]:
    """Yield shuffled numpy batches forever (or for ``epochs`` passes).

    Batch layout matches training/flow_train.flow_matching_loss: latents
    (B,T,N,C), context (B,T,S,D), framestep (B,T), mask (B,T) with a
    prefix of ``n_cond_frames`` frames of every window = 1 (clean
    conditioning, excluded from the loss). ``n_cond_frames`` may be an
    ``(lo, hi)`` inclusive range: each row then draws its prefix length
    uniformly — the inference AR windows condition on anywhere from 1
    (interior windows) to T-1 (the clipped tail window) banked frames
    (ops/chunking.chunk_from), so training must cover that mask family.
    Incomplete trailing batches are dropped so the jitted step sees one
    static batch shape.
    """
    if batch_size < 1:
        raise ValueError(f"batch_size={batch_size} must be >= 1")
    if len(dataset) < batch_size:
        raise ValueError(
            f"dataset has {len(dataset)} windows < batch_size {batch_size}"
        )
    rng = np.random.default_rng(seed)
    T = dataset.window
    if isinstance(n_cond_frames, tuple):
        lo_c, hi_c = n_cond_frames
        if not (0 <= lo_c <= hi_c < T):
            raise ValueError(
                f"n_cond_frames range {n_cond_frames} must satisfy "
                f"0 <= lo <= hi < window={T}"
            )
    else:
        lo_c = hi_c = int(n_cond_frames)

    def make_mask() -> np.ndarray:
        counts = rng.integers(lo_c, hi_c + 1, size=(batch_size,))
        return (
            np.arange(T)[None, :] < counts[:, None]
        ).astype(np.float32)

    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(len(dataset))
        for lo in range(0, len(order) - batch_size + 1, batch_size):
            items = [dataset[int(i)] for i in order[lo : lo + batch_size]]
            yield {
                "latents": np.stack([it["latents"] for it in items]),
                "context": np.stack([it["context"] for it in items]),
                "framestep": np.stack(
                    [it["framestep"] for it in items]
                ).astype(np.float32),
                "mask": make_mask(),
            }
        epoch += 1


class DecoderTrackDataset:
    """Pairs Stage-I clips with tracked ground-truth surfaces for Stage-II
    decoder training.

    Layout: ``clips_dir/{uid}.npz`` (the flow-clip format above — only
    ``latents``/``framestep`` are used) and ``tracks_dir/{uid}/surfaces.npy``
    with shape (T, V, 6) — positions+normals per tracked vertex, the
    ActionBench ground-truth layout (actionbench/evaluate_dataset.py), with
    positions in the decoder's (-1, 1) output range. Only uids present in
    BOTH directories index; per-uid frame counts must match.
    """

    def __init__(
        self,
        clips_dir: str | Path,
        tracks_dir: str | Path,
        window: int,
        stride: int = 1,
    ):
        if window < 2:
            raise ValueError(f"window={window} must be >= 2 (anchor + targets)")
        self.window = window
        clips_dir, tracks_dir = Path(clips_dir), Path(tracks_dir)
        clip_uids = {p.stem for p in clips_dir.glob("*.npz")}
        track_uids = {p.parent.name for p in tracks_dir.glob("*/surfaces.npy")}
        uids = sorted(clip_uids & track_uids)
        if not uids:
            raise FileNotFoundError(
                f"no shared uids between {clips_dir} (*.npz: {len(clip_uids)}) "
                f"and {tracks_dir} (*/surfaces.npy: {len(track_uids)})"
            )
        self._windows: list[tuple[Path, Path, int]] = []
        self.skipped_clips = 0
        for uid in uids:
            clip_path = clips_dir / f"{uid}.npz"
            track_path = tracks_dir / uid / "surfaces.npy"
            with np.load(clip_path) as z:
                frames = z["latents"].shape[0]
            surf_frames = np.load(track_path, mmap_mode="r").shape[0]
            if surf_frames != frames:
                raise ValueError(
                    f"{uid}: clip has {frames} frames but surfaces.npy has "
                    f"{surf_frames}"
                )
            if frames < window:
                self.skipped_clips += 1
                continue
            for start in range(0, frames - window + 1, stride):
                self._windows.append((clip_path, track_path, start))
        if not self._windows:
            raise ValueError(f"no paired clip has >= {window} frames")
        self._cache_key: Optional[Path] = None
        self._cache: Optional[tuple] = None

    def __len__(self) -> int:
        return len(self._windows)

    def _load(self, clip_path: Path, track_path: Path) -> tuple:
        if clip_path != self._cache_key:
            with np.load(clip_path) as z:
                clip = {k: z[k] for k in ("latents", "framestep")}
            self._cache = (clip, np.load(track_path))
            self._cache_key = clip_path
        return self._cache

    def __getitem__(self, idx: int) -> dict:
        clip_path, track_path, start = self._windows[idx]
        clip, surfaces = self._load(clip_path, track_path)
        sl = slice(start, start + self.window)
        return {
            "latents": clip["latents"][sl],
            "framestep": clip["framestep"][sl],
            "surfaces": surfaces[sl],  # (window, V, 6)
        }


def decoder_batches(
    dataset: DecoderTrackDataset,
    batch_size: int,
    *,
    vertex_bucket: int = 4096,
    seed: int = 0,
    epochs: Optional[int] = None,
) -> Iterator[dict]:
    """Yield shuffled decoder batches in the
    training/decoder_train.decoder_loss layout.

    Each window trains "deform the first frame's surface to the later
    frames": ``query`` is frame 0's (V, 6) points+normals, ``positions``
    are frames 1..T-1's tracked positions, alphas normalize the window's
    framesteps to [0, 1] exactly as Stage-II inference does
    (pipeline.generate_mesh_animation / ops/embeddings.apply_scaling).
    V pads to ``vertex_bucket`` with mask-0 rows (the same bucketing the
    inference decode uses for XLA static shapes).
    """
    if len(dataset) < batch_size:
        raise ValueError(
            f"dataset has {len(dataset)} windows < batch_size {batch_size}"
        )
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(len(dataset))
        for lo in range(0, len(order) - batch_size + 1, batch_size):
            items = [dataset[int(i)] for i in order[lo : lo + batch_size]]
            queries, positions, masks = [], [], []
            for it in items:
                surf = np.asarray(it["surfaces"], np.float32)
                V = surf.shape[1]
                if V > vertex_bucket:
                    raise ValueError(
                        f"sample has {V} vertices > vertex_bucket "
                        f"{vertex_bucket}"
                    )
                pos = surf[1:, :, :3]
                if np.abs(pos).max() > 1.0:
                    raise ValueError(
                        "tracked positions exceed the decoder's (-1, 1) "
                        f"output range (max |x| = {np.abs(pos).max():.3f}) — "
                        "normalize the tracks first"
                    )
                pad = vertex_bucket - V
                queries.append(
                    np.concatenate([surf[0], np.zeros((pad, 6), np.float32)])
                )
                positions.append(
                    np.concatenate(
                        [pos, np.zeros((pos.shape[0], pad, 3), np.float32)],
                        axis=1,
                    )
                )
                mask = np.zeros((vertex_bucket,), np.float32)
                mask[:V] = 1.0
                masks.append(mask)
            framestep = np.stack(
                [it["framestep"] for it in items]
            ).astype(np.float32)
            t_min = framestep.min(axis=1, keepdims=True)
            t_range = framestep.max(axis=1, keepdims=True) - t_min
            alphas = (framestep - t_min) / np.maximum(t_range, 1e-6)
            yield {
                "latents": np.stack([it["latents"] for it in items]),
                "framestep": framestep,
                "source_alpha": alphas[:, 0],
                "target_alphas": alphas[:, 1:],
                "query": np.stack(queries),
                "positions": np.stack(positions),
                "vertex_mask": np.stack(masks),
            }
        epoch += 1


class DevicePrefetcher:
    """Wrap a host-batch iterator; a daemon thread transfers batches to
    device (with ``sharding`` when given — e.g. parallel/mesh.batch_sharding
    so each dp shard receives only its rows) into a bounded queue of depth
    ``prefetch``, overlapping the host→HBM copy with the running step.

    Iteration order is preserved exactly. Exceptions on the worker re-raise
    at the consuming ``__next__``; ``close()`` (or garbage collection of an
    exhausted iterator) stops the worker.
    """

    _DONE = object()

    def __init__(self, batches: Iterator[dict], sharding=None, prefetch: int = 2):
        if prefetch < 1:
            raise ValueError(f"prefetch={prefetch} must be >= 1")
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._sharding = sharding
        self._source = batches
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        """Blocking put that still honors close(); returns False on stop."""
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self) -> None:
        try:
            for batch in self._source:
                if self._stop.is_set():
                    return
                if self._sharding is not None:
                    batch = jax.tree.map(
                        lambda x: jax.device_put(x, self._sharding), batch
                    )
                else:
                    batch = jax.tree.map(jax.device_put, batch)
                if not self._put(batch):
                    return
            self._put(self._DONE)
        except BaseException as exc:  # surfaces at the consumer
            self._put(exc)

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            try:
                item = self._queue.get(timeout=0.1)
                break
            except queue.Empty:
                if self._stop.is_set() or not self._thread.is_alive():
                    raise StopIteration
        if item is self._DONE:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self) -> None:
        self._stop.set()
        try:  # drain one slot so a blocked worker can observe the stop flag
            self._queue.get_nowait()
        except queue.Empty:
            pass

    def __del__(self):
        self.close()
