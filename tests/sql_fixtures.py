"""Back-compat shim: the init.sql master-data loader moved into the
package (sources/master_sql.py) so the CLI can use it too."""

from procurement_system_bigdata_spark.sources.master_sql import (  # noqa: F401
    INIT_SQL,
    master_data_frames,
    parse_inserts,
)
