"""Device-queue hygiene helpers for the single-controller TPU runtime.

On TPU (and especially through the remote axon tunnel) three facts compose
into a memory-safety hazard (measured, PERF.md r4):

1. Buffer ALLOCATIONS happen when an op is enqueued (client side, eagerly).
2. Buffer FREES (``Array.delete()`` / refcount drops) only retire as the
   device execution queue drains.
3. A RESOURCE_EXHAUSTED error is STICKY: after one allocation failure the
   runtime fails every subsequent allocation — even 8-byte scalars with
   >7 GiB genuinely free (reproduced on the v5e tunnel backend).

So "free a big tree, then allocate a big tree" is only safe with a queue
drain between: otherwise the new allocations race the pending frees and a
spurious OOM permanently poisons the process.  ``block_until_ready`` is
NOT a drain through the tunnel (it returns before the worker-side queue
empties); fetching a freshly-computed value is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def drain_device_queue() -> None:
    """Drain the device execution queue with an honest fence.

    Enqueues a trivial computation and FETCHES its value: the in-order
    queue guarantees every previously enqueued op (including pending buffer
    frees) has retired when the fetch returns.  Call this after dropping a
    multi-GiB pytree and before the next allocation burst (model swap,
    relayout, optimizer init).  No-op on CPU, where dispatch is synchronous
    and the hazard does not exist.
    """
    if jax.default_backend() == "cpu":
        return
    float(jnp.sum(jnp.ones((8,), jnp.float32)))
