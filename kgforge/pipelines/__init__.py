"""kgforge.pipelines"""
