"""Background-thread batch prefetching.

Host-side collation (transforms + pad_and_batch) runs in a worker thread a
fixed number of batches ahead of the consumer, so batch prep overlaps
device compute — the TPU-side answer to the reference's in-loop
``torch.load`` stalls (SURVEY.md §3.2 note). Exceptions in the producer
propagate to the consumer."""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_DONE = object()


class Prefetcher:
    """Iterate ``iterable`` in a background thread with a bounded buffer.

    Abandoning iteration mid-stream (consumer exception / early break)
    stops the worker promptly: the generator's ``finally`` sets a stop
    flag the producer polls between puts, so no thread is left parked on a
    full queue holding batch memory."""

    def __init__(self, iterable: Iterable[T], depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._err: BaseException | None = None
        self._stop = threading.Event()
        self._iterable = iterable

        def worker():
            iterable = self._iterable
            try:
                for item in iterable:
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # propagate to the consumer
                self._err = e
            finally:
                while not self._stop.is_set():
                    try:
                        self._q.put(_DONE, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        # lazy start: a Prefetcher that is never iterated must not spawn a
        # worker (it would spin on a full queue holding batches forever)
        self._thread = threading.Thread(target=worker, daemon=True)
        self._started = False

    def __iter__(self) -> Iterator[T]:
        if not self._started:
            self._started = True
            self._thread.start()
        try:
            while True:
                item = self._q.get()
                if item is _DONE:
                    self._thread.join()
                    if self._err is not None:
                        raise self._err
                    return
                yield item
        finally:
            self._stop.set()


def prefetch(iterable: Iterable[T], depth: int = 2) -> Iterator[T]:
    return iter(Prefetcher(iterable, depth))


def dp_batch_groups(batches: Iterable[T], dp: int) -> Iterator[T]:
    """Group a flat batch stream into stacked groups of ``dp`` (the shape
    :func:`sldm_gnn_tpu.parallel.data_parallel.make_dp_train_step` shards
    over mesh axis 'dp').

    A short final group is padded with zeroed batches — their
    ``graph_mask`` is all-False, so the masked loss/metrics ignore them and
    every step of an epoch keeps the same static shape (no recompiles).
    """
    group: list[T] = []
    for b in batches:
        group.append(b)
        if len(group) == dp:
            yield _stack_group(group)
            group = []
    if group:
        dummy = _tree_zeros_like(group[-1])
        group.extend([dummy] * (dp - len(group)))
        yield _stack_group(group)


def _stack_group(group):
    import jax
    import numpy as np

    def stack(*xs):
        arrs = [np.asarray(x) for x in xs]
        shapes = {a.shape for a in arrs}
        if len(shapes) > 1:
            raise ValueError(
                f"dp batch group mixes batch shapes {sorted(shapes)}: the dp "
                "step stacks consecutive batches, so every batch of an epoch "
                "must share one capacity — use GraphLoader(buckets=1) (or a "
                "fixed dims=) when training with mesh="
            )
        return np.stack(arrs)

    return jax.tree.map(stack, *group)


def _tree_zeros_like(batch):
    import jax
    import numpy as np

    return jax.tree.map(lambda a: np.zeros_like(np.asarray(a)), batch)


def prefetch_to_device(iterable: Iterable[T], depth: int = 2, *, sharding=None) -> Iterator[T]:
    """Prefetch batches AND move them to device in the worker thread.

    ``sharding`` is a ``jax.sharding.Sharding`` (e.g.
    ``NamedSharding(mesh, P('dp'))`` for the stacked dp batches of
    :func:`sldm_gnn_tpu.parallel.shard_batch`) applied to every leaf; None
    places on the default device. Host collation *and* the host→device
    transfer then overlap device compute, so the train step dequeues
    already-resident, already-sharded arrays instead of paying the
    transfer inside its dispatch (the dp-loader item of ROADMAP.md).
    """
    import jax

    def gen():
        for item in iterable:
            if sharding is None:
                yield jax.tree.map(jax.numpy.asarray, item)
            else:
                yield jax.device_put(item, jax.tree.map(lambda _: sharding, item))

    return prefetch(gen(), depth)
