"""kgforge.sources"""
