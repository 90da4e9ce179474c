from .lighting import (
    lighting, ambient_lighting, directional_lighting,
    AmbientLighting, DirectionalLighting, Lighting,
    GGX, SchlickGGX, GeometrySmith, fresnelSchlick, SSS,
)
