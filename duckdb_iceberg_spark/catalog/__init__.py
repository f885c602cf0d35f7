"""Catalog layer: Iceberg REST catalog client (ATTACH analogue)."""

from .rest_catalog import (  # noqa: F401
    CatalogError,
    CommitConflict,
    OAuth2Config,
    RestCatalog,
    RestCatalogConfig,
    RestTable,
)
from .sigv4 import SigV4Config, sign_request  # noqa: F401
from .scan_planning import (  # noqa: F401
    plan_table_scan,
    predicate_to_rest,
    scan_rest_table,
)
