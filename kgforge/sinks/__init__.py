"""kgforge.sinks"""
