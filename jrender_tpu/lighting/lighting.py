"""Lighting: ambient + directional with Lambert or Cook-Torrance PBR.

Parity targets in the reference:
  * ambient_lighting            -- jrender/renderer/lighting/ambient_lighting.py:4
  * directional_lighting + PBR  -- directional_lighting.py:5-144
    (GGX NDF :5, Schlick-GGX :21, Smith geometry :33, Schlick Fresnel :47)
  * Lighting module             -- lighting.py:159-221
  * lighting() free function    -- lighting.py:11-55
  * SSS texture-space diffusion -- lighting.py:86-156

All tensor math is pure JAX; lights bake into mesh textures exactly like
the reference (clamped to [0,1]).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.math import normalize


def ambient_lighting(light, light_intensity=0.5, light_color=(1, 1, 1)):
    light_color = jnp.asarray(light_color, jnp.float32)
    if light_color.ndim == 1:
        light_color = light_color[None]
    return light + light_intensity * light_color[:, None, :]


def GGX(N, H, roughness):
    a = roughness * roughness
    a2 = a * a
    axis = 3 if N.ndim == 4 else 2
    NdotH = jax.nn.relu(jnp.sum(N * H, axis=axis))
    NdotH2 = (NdotH * NdotH)[..., None]
    denom = NdotH2 * (a2 - 1.0) + 1.0
    denom = 3.1415 * denom * denom
    return a2 / denom


def SchlickGGX(NdotV, roughness):
    r = roughness + 1.0
    k = (r * r) / 8.0
    NdotV = NdotV[..., None]
    return NdotV / (NdotV * (1.0 - k) + k)


def GeometrySmith(N, V, L, roughness):
    axis = 3 if N.ndim == 4 else 2
    NdotV = jax.nn.relu(jnp.sum(N * V, axis=axis))
    NdotL = jax.nn.relu(jnp.sum(N * L, axis=axis))
    return SchlickGGX(NdotL, roughness) * SchlickGGX(NdotV, roughness)


def fresnelSchlick(cosTheta, F0):
    return F0 + (1.0 - F0) * ((1.0 - cosTheta) ** 5)[..., None]


def directional_lighting(diffuseLight, specularLight, normals, light_intensity=0.5,
                         light_color=(1, 1, 1), light_direction=(0, 1, 0),
                         positions=None, eye=None, with_specular=False,
                         metallic_textures=None, roughness_textures=None,
                         Gbuffer='None', transform=None):
    """Accumulate one directional light into (diffuseLight, specularLight).

    normals: [B,F,3] (surface), [B,V,3] (vertex) or [B,F,T,3] (per-texel).
    """
    light_color = jnp.asarray(light_color, jnp.float32)
    light_direction = normalize(jnp.asarray(light_direction, jnp.float32), axis=0)
    if eye is not None:
        eye = jnp.asarray(eye, jnp.float32)
    if light_color.ndim == 1:
        light_color = light_color[None]
    if light_direction.ndim == 1:
        light_direction = light_direction[None]

    per_texel = normals.ndim == 4
    axis = 3 if per_texel else 2
    if per_texel:
        cosine = jax.nn.relu(jnp.sum(normals * light_direction, axis=axis))
        if positions is not None:
            positions = positions[:, :, None, :]
    else:
        cosine = jax.nn.relu(jnp.sum(normals * light_direction, axis=axis))

    if with_specular and not per_texel and metallic_textures is not None:
        # average texel maps down to per-face/vertex scalars (:69-84)
        if metallic_textures.ndim == 4:
            metallic_textures = jnp.mean(metallic_textures, axis=2)
            roughness_textures = jnp.mean(roughness_textures, axis=2)
        elif metallic_textures.ndim == 6:
            metallic_textures = jnp.mean(metallic_textures, axis=(2, 3, 4))
            roughness_textures = jnp.mean(roughness_textures, axis=(2, 3, 4))

    if (with_specular and eye is not None and positions is not None
            and metallic_textures is not None and roughness_textures is not None):
        N = normals
        if eye.ndim == 1:
            eye = eye[None]
        if per_texel:
            eyeb = eye[:, None, None, :]
        else:
            eyeb = eye[:, None, :]
        V = normalize(eyeb - positions, axis=axis)
        L = light_direction
        H = normalize(V + L, axis=axis)

        metallic = metallic_textures
        roughness = roughness_textures
        F0 = jnp.asarray((0.4, 0.4, 0.4), jnp.float32)
        albedo = jnp.asarray((1.0, 1.0, 1.0), jnp.float32)
        if per_texel:
            F0 = F0[None, None, None, :] * (1 - metallic) + albedo[None, None, None, :] * metallic
            radiance = light_intensity * (light_color[:, None, None, :] * cosine[..., None])
        else:
            F0 = F0[None, None, :] * (1 - metallic) + albedo[None, None, :] * metallic
            radiance = light_intensity * (light_color[:, None, :] * cosine[..., None])

        NDF = GGX(N, H, roughness)
        G = GeometrySmith(N, V, L, roughness)
        F = fresnelSchlick(jax.nn.relu(jnp.sum(H * V, axis=axis)), F0)
        KS = F
        KD = (1.0 - KS) * (1.0 - metallic)

        diffuseLight = diffuseLight + KD * radiance
        numerator = NDF * G * F
        denominator = (4.0 * jax.nn.relu(jnp.sum(N * V, axis=axis)) *
                       jax.nn.relu(jnp.sum(N * L, axis=axis)))[..., None]
        specular = numerator / jnp.clip(denominator, 0.01, None)
        specularLight = specularLight + specular * radiance
    else:
        if per_texel:
            diffuseLight = diffuseLight + light_intensity * (
                light_color[:, None, None, :] * cosine[..., None])
        else:
            diffuseLight = diffuseLight + light_intensity * (
                light_color[:, None, :] * cosine[..., None])

    if Gbuffer == 'normal':
        specularLight = specularLight * 0.0
        diffuseLight = normals * 0.5 + 0.5
    elif Gbuffer == 'depth':
        specularLight = specularLight * 0.0
        viewpos = transform.tranpos(positions)
        zmax = jnp.max(viewpos[..., 2])
        z = viewpos[..., 2] / zmax
        diffuseLight = jnp.stack([z, z, z], axis=-1)
    return [diffuseLight, specularLight]


def lighting(faces, textures, intensity_ambient=0.5, intensity_directional=0.5,
             color_ambient=(1, 1, 1), color_directional=(1, 1, 1), direction=(0, 1, 0)):
    """Free-function lighting used by the n3mr path (lighting.py:11-55)."""
    bs, nf = faces.shape[:2]
    color_ambient = jnp.asarray(color_ambient, jnp.float32)
    color_directional = jnp.asarray(color_directional, jnp.float32)
    direction = jnp.asarray(direction, jnp.float32)
    if color_ambient.ndim == 1:
        color_ambient = color_ambient[None]
    if color_directional.ndim == 1:
        color_directional = color_directional[None]
    if direction.ndim == 1:
        direction = direction[None]

    light = jnp.zeros((bs, nf, 3), jnp.float32)
    if intensity_ambient != 0:
        light = light + intensity_ambient * color_ambient[:, None, :]
    if intensity_directional != 0:
        fv = faces.reshape(bs * nf, 3, 3)
        v10 = fv[:, 0] - fv[:, 1]
        v12 = fv[:, 2] - fv[:, 1]
        normals = normalize(jnp.cross(v10, v12), eps=1e-5).reshape(bs, nf, 3)
        if direction.ndim == 2:
            direction = direction[:, None, :]
        cos = jax.nn.relu(jnp.sum(normals * direction, axis=2))
        light = light + intensity_directional * (color_directional[:, None, :] * cos[..., None])
    light = light[:, :, None, None, None, :]
    return textures * light


class AmbientLighting:
    def __init__(self, light_intensity=0.5, light_color=(1, 1, 1)):
        self.light_intensity = light_intensity
        self.light_color = light_color

    def __call__(self, light):
        return ambient_lighting(light, self.light_intensity, self.light_color)


class DirectionalLighting:
    def __init__(self, light_intensity=0.5, light_color=(1, 1, 1),
                 light_direction=(0, 1, 0), Gbuffer='None', transform=None):
        self.light_intensity = light_intensity
        self.light_color = light_color
        self.light_direction = light_direction
        self.Gbuffer = Gbuffer
        self.transform = transform

    def __call__(self, diffuseLight, specularLight, normals, positions=None, eye=None,
                 with_specular=False, metallic_textures=None, roughness_textures=None):
        return directional_lighting(diffuseLight, specularLight, normals,
                                    self.light_intensity, self.light_color,
                                    self.light_direction, positions, eye, with_specular,
                                    metallic_textures, roughness_textures,
                                    self.Gbuffer, self.transform)


def SSS(diffuseLight, specular, mesh):
    """Texture-space subsurface scattering (lighting.py:86-156)."""
    from ..ops.softras import soft_rasterize_with_aux, make_params
    from ..ops.image import gaussian_blur, compute_stretch_map
    from ..ops.texture import load_textures_softras

    irradiance = jnp.sqrt(mesh.textures * diffuseLight)
    image_size = 2048
    p = make_params(image_size=image_size, background_color=(0, 0, 0), near=1, far=100,
                    fill_back=True, eps=1e-5, sigma_val=1e-5, dist_func='barycentric',
                    dist_eps=1e-5, gamma_val=1e-4, aggr_func_rgb='hard',
                    aggr_func_alpha='prod', texture_type='surface')

    def rasterize_uv(tex):
        coords = (mesh.face_texcoords - 0.5) * 2
        coords = jnp.concatenate(
            [coords, jnp.full(coords.shape[:-1] + (1,), 1.5)], axis=-1)
        out, _, _ = soft_rasterize_with_aux(coords.reshape(coords.shape[0], -1, 9),
                                            tex, p)
        return jnp.transpose(out[0, :3], (1, 2, 0))

    worldcoord_textures = (mesh.face_vertices + 1) / 2 * 255.0
    Worldcoord_Map = rasterize_uv(worldcoord_textures.reshape(
        worldcoord_textures.shape[0], worldcoord_textures.shape[1], 3, 3))
    irradiance_Map = rasterize_uv(irradiance)
    specular_Map = rasterize_uv(jnp.broadcast_to(specular, irradiance.shape))

    stretchU, stretchV = compute_stretch_map(Worldcoord_Map * 7)
    stretchU = jnp.clip(stretchU, 0.0, 1.0)
    stretchV = jnp.clip(stretchV, 0.0, 1.0)

    Gaussian_basis = [0, 25, 100, 400]
    tap_num = 7
    Gaussian_weight = [[0.7, 0.2, 0.1], [0.1, 0.2, 0.7], [0.1, 0.2, 0.7]]

    final_map = jnp.zeros_like(irradiance_Map)
    for j in range(3):
        sU = stretchU
        sV = stretchV
        chan = irradiance_Map[:, :, j]
        basis = []
        for i in range(len(Gaussian_basis) - 1):
            v = Gaussian_basis[i + 1] - Gaussian_basis[i]
            sU = gaussian_blur(sU, tap_num, v, sU, 1)
            chan = gaussian_blur(chan, tap_num, v, sU, 1)
            sV = gaussian_blur(sV, tap_num, v, sV, 0)
            chan = gaussian_blur(chan, tap_num, v, sV, 0)
            basis.append(chan)
        for k, img in enumerate(basis):
            final_map = final_map.at[:, :, j].add(Gaussian_weight[j][k] * img)

    final_map = final_map * irradiance_Map + specular_Map
    final_map = final_map[::-1]
    is_update = jnp.ones((mesh.faces.shape[1],), jnp.int32)
    final_textures = jnp.ones((mesh.faces.shape[1], mesh.texture_res ** 2, 3), jnp.float32)
    final_textures = load_textures_softras(final_map, mesh.face_texcoords[0],
                                           final_textures, is_update)[None]
    return final_textures


class Lighting:
    """Lighting pipeline stage; reference lighting.py:159-221."""

    def __init__(self, light_mode='surface', intensity_ambient=0.5,
                 color_ambient=(1, 1, 1), intensity_directionals=0.5,
                 color_directionals=(1, 1, 1), directions=(0, 1, 0),
                 Gbuffer='None', transform=None):
        if light_mode not in ('surface', 'vertex'):
            raise ValueError('Lighting mode only support surface and vertex')
        self.Gbuffer = Gbuffer
        self.transform = transform
        self.light_mode = light_mode
        self.ambient = AmbientLighting(intensity_ambient, color_ambient)
        self.directionals = [DirectionalLighting(intensity_directionals,
                                                 color_directionals, directions,
                                                 Gbuffer, transform)]

    def __call__(self, mesh, eyes=None):
        if self.Gbuffer == 'albedo':
            return mesh
        if self.Gbuffer in ('normal', 'depth'):
            mesh.textures = jnp.ones_like(mesh.textures)
        if self.light_mode == 'surface':
            if mesh.normal_textures is not None:
                diffuseLight = jnp.zeros(mesh.textures.shape, jnp.float32)
                specularLight = jnp.zeros(mesh.textures.shape, jnp.float32)
                diffuseLight = self.ambient(diffuseLight)
                for directional in self.directionals:
                    diffuseLight, specularLight = directional(
                        diffuseLight, specularLight, mesh.surface_ResNormals,
                        jnp.sum(mesh.face_vertices, axis=2) / 3.0, eyes,
                        mesh.with_specular, mesh.metallic_textures,
                        mesh.roughness_textures)
            else:
                diffuseLight = jnp.zeros(mesh.faces.shape, jnp.float32)
                specularLight = jnp.zeros(mesh.faces.shape, jnp.float32)
                diffuseLight = self.ambient(diffuseLight)
                for directional in self.directionals:
                    diffuseLight, specularLight = directional(
                        diffuseLight, specularLight, mesh.surface_normals,
                        jnp.sum(mesh.face_vertices, axis=2) / 3.0, eyes,
                        mesh.with_specular, mesh.metallic_textures,
                        mesh.roughness_textures)
                diffuseLight = diffuseLight[:, :, None, :]
                specularLight = specularLight[:, :, None, :]
            if mesh.textures.ndim == 4 and mesh.with_SSS:
                mesh.textures = jnp.clip(SSS(diffuseLight, specularLight, mesh), 0.0, 1.0)
            elif mesh.textures.ndim == 4:
                mesh.textures = jnp.clip(
                    mesh.textures * diffuseLight + jnp.ones_like(mesh.textures) * specularLight,
                    0.0, 1.0)
            elif mesh.textures.ndim == 6:
                d = diffuseLight[:, :, None, None, ...] if diffuseLight.ndim == 4 \
                    else diffuseLight[:, :, None, None, None, :]
                s = specularLight[:, :, None, None, ...] if specularLight.ndim == 4 \
                    else specularLight[:, :, None, None, None, :]
                mesh.textures = jnp.clip(
                    mesh.textures * d + jnp.ones_like(mesh.textures) * s, 0.0, 1.0)
        elif self.light_mode == 'vertex':
            diffuseLight = jnp.zeros(mesh.vertices.shape, jnp.float32)
            specularLight = jnp.zeros(mesh.vertices.shape, jnp.float32)
            diffuseLight = self.ambient(diffuseLight)
            for directional in self.directionals:
                diffuseLight, specularLight = directional(
                    diffuseLight, specularLight, mesh.vertex_normals, mesh.vertices,
                    eyes, mesh.with_specular, mesh.metallic_textures,
                    mesh.roughness_textures)
            if mesh.textures.ndim == 4:
                mesh.textures = jnp.clip(
                    mesh.textures * diffuseLight[:, :, None, :] +
                    jnp.ones_like(mesh.textures) * specularLight[:, :, None, :], 0.0, 1.0)
            elif mesh.textures.ndim == 3:
                # vertex textures [B,V,3]
                mesh.textures = jnp.clip(
                    mesh.textures * diffuseLight +
                    jnp.ones_like(mesh.textures) * specularLight, 0.0, 1.0)
            elif mesh.textures.ndim == 6:
                mesh.textures = jnp.clip(
                    mesh.textures * diffuseLight[:, :, None, None, None, :] +
                    jnp.ones_like(mesh.textures) * specularLight[:, :, None, None, None, :],
                    0.0, 1.0)
        return mesh
