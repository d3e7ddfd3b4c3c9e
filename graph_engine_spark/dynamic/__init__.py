from graph_engine_spark.dynamic.instrument import (
    FunctionCallEvent,
    install_import_hook,
    uninstall_import_hook,
    drain_events,
    clear_events,
    monitored_files,
    events_to_edge_rows,
    events_to_call_totals,
    write_events_ndjson,
)

__all__ = [
    "FunctionCallEvent",
    "install_import_hook",
    "uninstall_import_hook",
    "drain_events",
    "clear_events",
    "monitored_files",
    "events_to_edge_rows",
    "events_to_call_totals",
    "write_events_ndjson",
]
