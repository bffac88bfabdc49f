"""kgforge.functions"""
