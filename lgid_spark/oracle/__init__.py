from .reference import (  # noqa: F401
    extract_text,
    scrub_text,
    get_langid_model,
    metrics_for,
    drop_reasons_for,
    process_pages,
    PPL_THRESHOLD,
    CONF_THRESHOLD,
)
