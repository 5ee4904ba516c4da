"""Structured Streaming surface (SURVEY §2.11)."""

from .dedup_join import (  # noqa: F401
    stream_interval_join,
    streaming_ann_ingest,
    streaming_dedup,
    streaming_ivfpq_ingest,
)
from .dynamic_table import (  # noqa: F401
    alter_dynamic_table_lag,
    dynamic_table,
    microbatch_stream,
    refresh_dynamic_table,
)
from .evaluation import (  # noqa: F401
    calib_cells_merge_batch,
    auc_cells_merge_batch,
    auc_from_cells,
    calibration_from_cells,
    streaming_auc_ingest,
    streaming_calibration_ingest,
)
from .gap import streaming_best_evidence  # noqa: F401
from .guard import (  # noqa: F401
    streaming_contamination_guard,
    streaming_near_dup_guard,
)
from .sketches import (  # noqa: F401
    cms_merge_batch,
    hll_merge_batch,
    hll_table_estimate,
    logbucket_merge_batch,
    pref_counts_merge_batch,
    reservoir_merge_batch,
    streaming_logbucket_ingest,
    streaming_cms_ingest,
    streaming_hll_ingest,
    streaming_weighted_reservoir,
)
from .stateful import stateful_user_totals  # noqa: F401
from .windows import session_window_agg, sliding_window_agg, tumbling_window_agg  # noqa: F401
