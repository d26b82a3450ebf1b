from flapi_spark.sources.registry import Connection, ConnectionRegistry, load_connections

__all__ = ["Connection", "ConnectionRegistry", "load_connections"]
