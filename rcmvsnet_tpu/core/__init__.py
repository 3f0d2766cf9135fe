from . import io, geometry
