from .dedup import dedup_keep_latest, exact_dedup  # noqa: F401
from .incremental import checksum_classify_changes, high_watermark_filter, row_checksum  # noqa: F401
from .scalable import quantile_bucket  # noqa: F401
from .scd2 import scd2_classify_changes, scd2_rebuild  # noqa: F401
from .sessionize import sessionize  # noqa: F401
