"""kgforge.state"""
