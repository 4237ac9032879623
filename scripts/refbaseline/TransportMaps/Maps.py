"""Stub for TransportMaps.Maps — only referenced in the reference's
ImplicitPriorFactor type annotation (Factors.py:857), never instantiated
on the benchmark paths."""


class TransportMap:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("TransportMap shim is a type stub only")
