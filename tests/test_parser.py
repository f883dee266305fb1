"""pbrt-v4 parser tests: tokenizer, directives, param dicts, graphics
state, and a full parse→render round trip (the reference's parser tests
feed pbrt strings through parse_str the same way, SURVEY.md §4)."""

import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from shimmer_tpu.loading.parser import parse_str
from shimmer_tpu.loading.scene_builder import SceneBuilder
from shimmer_tpu.loading.tokenizer import TokenStream, tokenize

CORNELL = """
Integrator "path" "integer maxdepth" [4]
Sampler "independent" "integer pixelsamples" [8]
Film "rgb" "integer xresolution" [32] "integer yresolution" [32]
    "string filename" "cornell.pfm"
PixelFilter "box"
Camera "perspective" "float fov" [50]

WorldBegin

MakeNamedMaterial "white" "string type" "diffuse"
    "rgb reflectance" [0.73 0.73 0.73]
MakeNamedMaterial "red" "string type" "diffuse"
    "rgb reflectance" [0.65 0.05 0.05]

# floor quad
NamedMaterial "white"
Shape "trianglemesh"
    "integer indices" [0 1 2 0 2 3]
    "point3 P" [-1 0 -1  1 0 -1  1 0 1  -1 0 1]

AttributeBegin
  NamedMaterial "red"
  Translate 0 1 0
  Shape "sphere" "float radius" [0.4]
AttributeEnd

AttributeBegin
  AreaLightSource "diffuse" "rgb L" [10 10 10]
  Material "diffuse" "rgb reflectance" [0 0 0]
  Shape "trianglemesh"
    "integer indices" [0 1 2 0 2 3]
    "point3 P" [-0.3 1.99 -0.3  0.3 1.99 -0.3  0.3 1.99 0.3  -0.3 1.99 0.3]
AttributeEnd

LightSource "infinite" "rgb L" [0.1 0.1 0.1]
"""


class TestTokenizer:
    def test_basic(self):
        toks = [t for t, _ in tokenize('Shape "sphere" "float radius" [1.5] # c\nScale 1 2 3')]
        assert toks == [
            "Shape", '"sphere"', '"float radius"', "[", "1.5", "]",
            "Scale", "1", "2", "3",
        ]

    def test_string_with_spaces(self):
        toks = [t for t, _ in tokenize('"string filename" "my file.png"')]
        assert toks == ['"string filename"', '"my file.png"']

    def test_line_numbers(self):
        pairs = list(tokenize("A\nB\nC"))
        assert [loc.line for _, loc in pairs] == [1, 2, 3]


class TestParse:
    def test_cornell_structure(self):
        b = SceneBuilder()
        parse_str(CORNELL, b)
        assert b.integrator_spec[0] == "path"
        assert b.integrator_spec[1].get_one_int("maxdepth", 0) == 4
        assert b.sampler_spec[1].get_one_int("pixelsamples", 0) == 8
        assert len(b.shapes) == 3  # floor mesh, sphere, light quad
        assert b.shapes[1]["kind"] == "sphere"
        assert b.shapes[2]["area_light"] is not None
        assert len(b.lights) == 1  # the infinite light
        assert "white" in b.named_materials and "red" in b.named_materials

    def test_graphics_state_restored(self):
        b = SceneBuilder()
        parse_str(
            """
            WorldBegin
            Material "diffuse" "rgb reflectance" [1 0 0]
            AttributeBegin
              Material "diffuse" "rgb reflectance" [0 1 0]
              Translate 5 0 0
              Shape "sphere"
            AttributeEnd
            Shape "sphere"
            """,
            b,
        )
        s_inner, s_outer = b.shapes
        assert s_inner["material"] != s_outer["material"]
        # inner translated, outer not
        assert np.isclose(s_inner["ctm"][0, 3], 5.0)
        assert np.isclose(s_outer["ctm"][0, 3], 0.0)

    def test_transform_directives(self):
        b = SceneBuilder()
        parse_str(
            """
            Translate 1 2 3
            Scale 2 2 2
            Rotate 90 0 0 1
            WorldBegin
            """,
            b,
        )
        # CTM reset at WorldBegin
        np.testing.assert_allclose(b.gs.ctm, np.eye(4))

    def test_object_instancing(self):
        """Triangle meshes instance via the two-level BVH (no vertex
        duplication, VERDICT r2 item 7); non-triangle shapes (spheres)
        fall back to flattening."""
        b = SceneBuilder()
        parse_str(
            """
            WorldBegin
            ObjectBegin "tree"
              Shape "sphere" "float radius" [0.5]
              Shape "trianglemesh"
                "integer indices" [0 1 2]
                "point3 P" [0 0 0  1 0 0  0 1 0]
            ObjectEnd
            ObjectInstance "tree"
            Translate 3 0 0
            ObjectInstance "tree"
            """,
            b,
        )
        # spheres flattened (2 copies); triangle mesh NOT flattened
        assert len(b.shapes) == 2
        assert all(r["kind"] == "sphere" for r in b.shapes)
        assert len(b.instances) == 2
        assert np.isclose(b.instances[0][1][0, 3], 0.0)
        assert np.isclose(b.instances[1][1][0, 3], 3.0)

    def test_instanced_scene_renders(self):
        b = SceneBuilder()
        parse_str(
            """
            Film "rgb" "integer xresolution" [12] "integer yresolution" [12]
            Sampler "independent" "integer pixelsamples" [2]
            Integrator "path" "integer maxdepth" [2]
            Camera "perspective" "float fov" [50]
            WorldBegin
            Material "diffuse" "rgb reflectance" [0.6 0.6 0.6]
            ObjectBegin "blade"
              Shape "trianglemesh"
                "integer indices" [0 1 2  0 2 3]
                "point3 P" [-0.4 0 2  0.4 0 2  0.4 0.8 2  -0.4 0.8 2]
            ObjectEnd
            ObjectInstance "blade"
            Translate 1 0 0
            ObjectInstance "blade"
            Translate -2 0 0
            ObjectInstance "blade"
            LightSource "infinite" "rgb L" [0.5 0.5 0.5]
            """,
            b,
        )
        job = b.create()
        assert job.scene.has_instanced
        assert int(job.scene.instanced.inst_fwd.shape[0]) == 3
        from shimmer_tpu.render import render

        img, _ = render(
            job.scene, job.camera, job.film, job.sampler,
            integrator="path", spp=2, max_depth=2,
        )
        img = np.asarray(img)
        assert np.isfinite(img).all() and img.mean() > 0

    def test_include(self, tmp_path):
        (tmp_path / "inc.pbrt").write_text('Shape "sphere" "float radius" [2]\n')
        b = SceneBuilder(search_dir=tmp_path)
        parse_str('WorldBegin\nInclude "inc.pbrt"\n', b, search_dir=tmp_path)
        assert len(b.shapes) == 1
        assert b.shapes[0]["pd"].get_one_float("radius", 0) == 2.0

    def test_spectrum_params(self):
        b = SceneBuilder()
        parse_str(
            """
            WorldBegin
            Material "conductor" "spectrum eta" "metal-Au-eta" "spectrum k" "metal-Au-k"
            Shape "sphere"
            """,
            b,
        )
        assert b.materials[-1]["kind_name"] == "conductor"

    def test_texture_directive(self):
        b = SceneBuilder()
        parse_str(
            """
            WorldBegin
            Texture "checker" "float" "constant" "float value" [0.25]
            Material "diffuse" "texture roughness" "checker"
            """,
            b,
        )
        assert "checker" in b.float_textures


class TestCreate:
    def test_cornell_creates_and_renders(self):
        b = SceneBuilder()
        parse_str(CORNELL, b)
        job = b.create()
        assert job.max_depth == 4
        assert job.film.resolution == (32, 32)
        assert job.scene.n_lights == 3  # 2 light-quad tris + infinite
        from shimmer_tpu.render import render

        img, _ = render(
            job.scene, job.camera, job.film, job.sampler,
            integrator=job.integrator, spp=4, max_depth=job.max_depth,
            wave_spp=4,
        )
        a = np.asarray(img)
        assert np.all(np.isfinite(a))
        assert a.mean() > 1e-3

    def test_dielectric_material_conversion(self):
        b = SceneBuilder()
        parse_str(
            """
            WorldBegin
            Material "dielectric" "float eta" [1.33]
            Shape "sphere"
            LightSource "infinite"
            """,
            b,
        )
        job = b.create()
        from shimmer_tpu.materials import material as mtl

        kinds = np.asarray(job.scene.materials.kind)
        assert mtl.DIELECTRIC in kinds
        eta = np.asarray(job.scene.materials.eta_float)
        assert np.isclose(eta[kinds == mtl.DIELECTRIC][0], 1.33)

    def test_cli_end_to_end(self, tmp_path):
        scene_file = tmp_path / "scene.pbrt"
        scene_file.write_text(CORNELL.replace("cornell.pfm", str(tmp_path / "out.pfm")))
        from shimmer_tpu.cli import main

        rc = main([str(scene_file), "--spp", "2", "-q", "--outfile", str(tmp_path / "out.pfm")])
        assert rc == 0
        from shimmer_tpu.film.image import Image

        img = Image.read(tmp_path / "out.pfm")
        assert img.resolution == (32, 32)
        assert np.isfinite(img.data).all()


class TestBilinearMesh:
    def test_bilinearmesh_parses_to_patches(self):
        b = SceneBuilder()
        parse_str(
            textwrap.dedent(
                """
                Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
                Sampler "independent" "integer pixelsamples" [2]
                Integrator "path" "integer maxdepth" [2]
                Camera "perspective" "float fov" [45]
                WorldBegin
                Material "diffuse" "rgb reflectance" [0.5 0.5 0.5]
                # quad facing +z at z=2 (p00 p10 p01 p11 order)
                Shape "bilinearmesh"
                    "integer indices" [0 1 2 3]
                    "point3 P" [-1 -1 2   1 -1 2   -1 1 2   1 1 2]
                AttributeBegin
                  AreaLightSource "diffuse" "rgb L" [5 5 5]
                  Shape "bilinearmesh"
                      "integer indices" [0 1 2 3]
                      "point3 P" [-0.5 2 -0.5  0.5 2 -0.5  -0.5 2 0.5  0.5 2 0.5]
                AttributeEnd
                LightSource "infinite" "rgb L" [0.2 0.2 0.2]
                """
            ),
            b,
        )
        job = b.create()
        assert job.scene.has_patches
        assert int(job.scene.patches.p00.shape[0]) == 2
        # light 0 is the patch area light (shape_kind 2 -> patch idx 1)
        import numpy as np

        sk = np.asarray(job.scene.lights.shape_kind)
        assert (sk == 2).sum() == 1
        from shimmer_tpu.render import render

        img, _ = render(
            job.scene, job.camera, job.film, job.sampler,
            integrator="path", spp=2, max_depth=2,
        )
        img = np.asarray(img)
        assert np.isfinite(img).all() and img.mean() > 0
