from .incremental import incremental_delta  # noqa: F401
from .transform import normalize_ads_df  # noqa: F401
