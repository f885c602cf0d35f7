"""Catalog layer: Iceberg REST catalog client (ATTACH analogue)."""

from .rest_catalog import (  # noqa: F401
    CatalogError,
    CommitConflict,
    OAuth2Config,
    RestCatalog,
    RestCatalogConfig,
    RestTable,
)
