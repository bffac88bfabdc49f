"""kgforge.stages"""
