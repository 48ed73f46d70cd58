from .model import PhysicsModel, Option
from .parser import parse, parse_file, parse_string, parse_raw, compile_spec, load_mjcf, load_mjcf_string
from .spec import RawSpec
