from riko_spark.functions.casts import cast_with_default, truthy  # noqa: F401
from riko_spark.functions.text import (  # noqa: F401
    extract_text_udf,
    find_feed_links_udf,
)
