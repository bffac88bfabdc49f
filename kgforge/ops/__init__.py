"""kgforge.ops"""
