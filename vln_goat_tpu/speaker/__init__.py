from .model import TranspeakerModel
from .speaker import Speaker
