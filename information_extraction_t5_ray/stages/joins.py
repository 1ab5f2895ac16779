"""Join strategies, named and scale-annotated.

The reference's joins are in-memory pandas merges (balance outer-join
``features/balance.py``-style, registry lookups); at corpus scale a join
is a *strategy decision*:

* ``broadcast_hash_join`` — the small side is ``ray.put`` ONCE and every
  map task merges against it; the big side never shuffles.  Right
  whenever one side fits comfortably in a worker heap (dimension
  tables, registries, alias dictionaries).  O(big) work, zero exchange.
* ``hash_join``           — both sides hash-partition on the key
  (Ray's hash-shuffle join operator).  The only choice when both sides
  are large; one full exchange of each side.  Supports inner / outer /
  semi / anti.

Skew note: a hash join's hot key lands every matching row in one
aggregator — pre-aggregate the skewed side first (partial combine on
the join key) or salt (append key%k to both sides, k copies of the
small side) before calling ``hash_join``; ``broadcast_hash_join`` is
immune (no exchange).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import pandas as pd
import pyarrow as pa


def broadcast_hash_join(
    big_ds,
    small: Union[pa.Table, pd.DataFrame],
    on: Union[str, Sequence[str]],
    how: str = "inner",
    suffix: str = "_r",
    batch_size: Optional[int] = None,
):
    """Join a Dataset against a driver-resident small side.

    ``small`` ships to the object store once; each batch does a pandas
    hash merge against the shared copy (zero-copy reads of the
    broadcast, no re-ship per batch).  ``how``: inner or left (the big
    side's row set is preserved or filtered; right/outer would need the
    small side's unmatched rows emitted exactly once across tasks —
    use ``hash_join`` for those).
    """
    import ray

    if how not in ("inner", "left"):
        raise ValueError(
            f"broadcast_hash_join supports inner/left, not {how!r}; "
            "use hash_join for right/full outer"
        )
    keys = [on] if isinstance(on, str) else list(on)
    small_df = small.to_pandas() if isinstance(small, pa.Table) else small
    ref = ray.put(small_df)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)
        return batch.merge(rhs, on=keys, how=how, suffixes=("", suffix))

    kw = {"batch_size": batch_size} if batch_size else {}
    return big_ds.map_batches(merge, batch_format="pandas", **kw)


def hash_join(
    left_ds,
    right_ds,
    on: Union[str, Sequence[str]],
    how: str = "inner",
    num_partitions: int = 64,
    right_on: Optional[Union[str, Sequence[str]]] = None,
):
    """Large-large join: both sides hash-partition on the key.

    Thin naming wrapper over ``Dataset.join`` so pipelines state the
    strategy explicitly; ``how`` accepts inner / left_outer /
    right_outer / full_outer / left_semi / right_semi / left_anti /
    right_anti.  ``num_partitions`` is the exchange width — size it to
    cluster cores, and salt skewed keys upstream (module docstring).
    """
    keys: Tuple[str, ...] = (on,) if isinstance(on, str) else tuple(on)
    rkeys = None
    if right_on is not None:
        rkeys = (right_on,) if isinstance(right_on, str) else tuple(right_on)
    return left_ds.join(
        right_ds,
        how,
        num_partitions=num_partitions,
        on=keys,
        right_on=rkeys,
        right_suffix="_r",
    )
