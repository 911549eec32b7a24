"""Test-side alias for the capture fixture builders (moved into the
package so protocol demo queries can build deterministic inputs)."""

from ingestor_etl_spark.capturegen import *  # noqa: F401,F403
from ingestor_etl_spark import capturegen as _c

# re-export private helpers used by tests
_aton = _c._aton
