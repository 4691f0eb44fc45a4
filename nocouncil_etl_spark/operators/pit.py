"""Bitemporal point-in-time join kernel, shared by the oracle-checked plan
(featurestore_plans.join_feature_store_pit) and the Engine facade verb —
one implementation of the two-axis as-of arithmetic (the shared-operator
contract from the gapfill advice item).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def point_in_time_join(
    obs: DataFrame,
    features: DataFrame,
    obs_key: str,
    entity_col: str,
    event_time_col: str,
    feat_entity_col: str,
    valid_col: str,
    load_col: str,
    as_of,
    value_cols: list[str],
) -> DataFrame:
    """For each observation, attach the newest feature row that was VALID
    at the observation's event time (valid_col ≤ event_time) AND LOADED by
    the as-of cutoff (load_col ≤ as_of). Left join: observations with no
    qualifying feature keep NULLs (dropping them silently is itself a
    training-data bug). Ties on valid_col break on the first value column
    — pass features with distinct valid_col per entity for a total pick.

    Scale: the load-axis filter prunes the feature side BEFORE the keyed
    join (one shuffle on the entity); the top-1 window partitions by the
    observation key."""
    pruned = features.filter(F.col(load_col) <= as_of)
    cand = (
        obs.join(
            pruned,
            (F.col(feat_entity_col) == F.col(entity_col))
            & (F.col(valid_col) <= F.col(event_time_col)),
        )
        .select(
            obs_key,
            *value_cols,
            F.row_number()
            .over(
                Window.partitionBy(obs_key).orderBy(
                    F.desc(valid_col), *value_cols
                )
            )
            .alias("_rn"),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return obs.join(cand, obs_key, "left")
