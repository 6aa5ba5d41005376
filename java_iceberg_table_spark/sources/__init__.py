from .engine_datasource import EngineTableDataSource, register_engine_datasource

__all__ = ["EngineTableDataSource", "register_engine_datasource"]
