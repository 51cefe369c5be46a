from .tables import (  # noqa: F401
    TABLES,
    lang_lookup,
    load_table,
    pages_from_documents,
    register_views,
    synthetic_pages,
)
