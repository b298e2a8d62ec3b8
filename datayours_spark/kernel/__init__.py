"""Pure-Python semantics kernel — no Spark dependency.

These modules reproduce the reference's quirk-laden scalar semantics
(SURVEY.md §2.7) exactly; they are used driver-side by the DataFrame
operators and are unit-tested in milliseconds.
"""

from datayours_spark.kernel.archives import (  # noqa: F401
    Archive,
    ArchiveSpecError,
    format_archives,
    parse_retention_def,
    parse_retention_str,
    validate_archives,
)
from datayours_spark.kernel.globs import (  # noqa: F401
    expand_braces,
    glob_to_regex,
    glob_path_to_regex,
)
from datayours_spark.kernel.timeparse import (  # noqa: F401
    parse_iso8601,
    parse_relative_time,
    parse_time,
)
from datayours_spark.kernel.rules import (  # noqa: F401
    AggregationRule,
    RewriteRule,
    SchemaRule,
    RuleEngine,
    load_conf_sections,
)
