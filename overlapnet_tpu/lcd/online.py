"""Online loop-closure detection over a scan sequence.

Headless re-design of the reference's animated demo3 loop
(reference demo/demo3_lcd.py:23-177): per frame, gate candidates by the
pose-covariance search ellipse and inactive-map constraints, score them
against the descriptor DB, and accept the best candidate above the overlap
threshold. Returns structured loop-closure edges (the input to the pose-graph
backend) instead of a matplotlib animation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from overlapnet_tpu.lcd.gating import (
    CovarianceEllipse,
    candidate_mask,
    trajectory_lengths,
)
from overlapnet_tpu.lcd.infer import Infer


@dataclass
class LoopClosure:
    """One detected loop: query frame, matched frame, overlap, yaw degrees,
    and antipodal-aware yaw confidence (softmax peak mass x flip margin,
    ops.correlation.yaw_confidence — scales the yaw information of the
    pose-graph edge, closures_to_edges; ~0 when a 180-degree-flipped
    correlation peak competes with the winner).

    ``yaw_deg`` is the yaw of ``frame`` expressed in ``match``'s frame,
    i.e. yaw(inv(P_match) @ P_frame): serving scores candidates as the LEFT
    leg and the query as the RIGHT (reference infer.py:186-190), and the
    pose-graph edge (match -> frame) consumes exactly this measurement."""

    frame: int
    match: int
    overlap: float
    yaw_deg: float
    confidence: float = 1.0


@dataclass
class OnlineLoopCloser:
    """Streaming LCD engine with the reference demo3 thresholds
    (demo3_lcd.py:53-55): inactive_time 100 frames, inactive_dist 50 m,
    overlap threshold 0.3, 3-sigma search ellipse."""

    infer: Infer
    poses: np.ndarray  # (n, 4, 4) LiDAR-frame poses
    covariances: np.ndarray | None = None  # (n, 6, 6)
    inactive_time: int = 100
    inactive_dist: float = 50.0
    overlap_threshold: float = 0.3
    nstd: float = 3.0
    closures: list[LoopClosure] = field(default_factory=list)

    def __post_init__(self):
        self._positions = self.poses[:, :2, 3]
        self._traj_length = trajectory_lengths(self._positions)
        self._next_frame = 0

    def _dispatch(self, idx: int):
        """Gate candidates for frame ``idx`` and dispatch its (fused,
        non-blocking) scoring step; returns the PendingFrame. Gating depends
        only on poses/covariances — never on earlier results — which is what
        makes frame pipelining legal."""
        assert idx == self._next_frame, (
            f"frames must be processed in order (expected {self._next_frame})"
        )
        self._next_frame += 1

        if self.covariances is not None:
            ellipse = CovarianceEllipse.from_covariance(
                self.covariances[idx][:2, :2], self.nstd
            )
        else:
            # No covariance stream: unbounded search space (gating by
            # inactive-map constraints only).
            ellipse = CovarianceEllipse(np.inf, np.inf, 0.0)

        mask = candidate_mask(
            idx,
            self._positions,
            self._traj_length,
            ellipse,
            self.inactive_time,
            self.inactive_dist,
        )
        candidates = np.flatnonzero(mask)
        return self.infer.dispatch_frame(idx, candidates.tolist())

    def _resolve(self, pending) -> LoopClosure | None:
        result = pending.result
        if result is None:
            return None
        match_frame, overlap, yaw_deg, conf = result
        if overlap > self.overlap_threshold:
            closure = LoopClosure(
                frame=pending.frame_id,
                match=int(match_frame),
                overlap=float(overlap),
                yaw_deg=float(yaw_deg),
                confidence=float(conf),
            )
            self.closures.append(closure)
            return closure
        return None

    def step(self, idx: int) -> LoopClosure | None:
        """Process frame ``idx`` synchronously (must be called for every
        frame in order so the embedding cache stays index-aligned,
        demo3_lcd.py:88-89, 121-123). Returns the accepted closure, if any.
        For throughput, prefer :meth:`run` — it pipelines frames."""
        return self._resolve(self._dispatch(idx))

    def run(
        self, n_frames: int | None = None, pipeline_depth: int = 8
    ) -> list[LoopClosure]:
        """Process all frames with up to ``pipeline_depth`` frames in
        flight: frame i+1's gating needs only poses, so its fused step is
        dispatched before frame i's result is fetched — and the result
        fetch (one blocking device round trip per frame) runs on a
        RESOLVER THREAD, overlapping with the next frames' host-side image
        assembly + dispatch (the GIL releases during the fetch). Results
        resolve in frame order on the single resolver; closures are
        identical to the sequential loop."""
        import queue as _queue
        import threading

        n = n_frames if n_frames is not None else len(self.poses)
        work: _queue.Queue = _queue.Queue(maxsize=max(1, pipeline_depth))
        errors: list[BaseException] = []

        def resolver():
            while True:
                p = work.get()
                if p is None:
                    return
                try:
                    self._resolve(p)
                except BaseException as e:  # surface in the main thread
                    errors.append(e)
                    return

        t = threading.Thread(target=resolver, daemon=True)
        t.start()
        try:
            for idx in range(self._next_frame, n):
                if errors:
                    break
                item = self._dispatch(idx)
                while not errors:  # don't block forever on a dead resolver
                    try:
                        work.put(item, timeout=5.0)
                        break
                    except _queue.Full:
                        continue
        finally:
            try:
                work.put(None, timeout=5.0)
            except _queue.Full:
                pass
            t.join()
        if errors:
            raise errors[0]
        return self.closures

    # -- fault tolerance ---------------------------------------------------

    def save_checkpoint(self, path: str) -> None:
        """Persist the full session state: frame cursor, accepted closures,
        and the embedding cache (via ``Infer.save_cache``). A crashed or
        preempted LCD session resumes exactly where it stopped without
        re-embedding historical scans (no reference counterpart)."""
        closures = np.array(
            [[c.frame, c.match, c.overlap, c.yaw_deg, c.confidence]
             for c in self.closures],
            np.float64,
        ).reshape(-1, 5)
        self.infer.save_cache(path)
        # np.savez can't append; write session metadata alongside the cache.
        with np.load(path) as data:
            arrays = dict(data)
        arrays["next_frame"] = np.int64(self._next_frame)
        arrays["closures"] = closures
        np.savez_compressed(path, **arrays)

    def resume(self, path: str) -> int:
        """Restore state saved by :meth:`save_checkpoint`; returns the next
        frame index to process (pass frames >= this to :meth:`step`)."""
        self.infer.restore_cache(path)
        with np.load(path) as data:
            self._next_frame = int(data["next_frame"])
            self.closures = [
                LoopClosure(int(f), int(m), float(o), float(y), float(c))
                for f, m, o, y, c in data["closures"]
            ]
        return self._next_frame
