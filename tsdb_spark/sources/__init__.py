"""Sources: adapters turning external tables into the engine's data model."""
