"""DataFrame -> DataFrame verbs (the engine's operator layer)."""
