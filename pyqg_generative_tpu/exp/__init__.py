from . import cli, pipeline
