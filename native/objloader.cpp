// Fast Wavefront OBJ parser (native core of jrender_tpu.io).
//
// The reference parses OBJ files with Python string splitting
// (jrender/io/utils/_load_obj_for_softras.py:142-207); for
// production-scale meshes (millions of faces) that is minutes of host
// time per load.  This parser is a single-pass C++ scanner exposed via
// a C ABI (loaded with ctypes -- no pybind11 dependency), ~100x faster.
//
// Semantics match the Python loaders:
//   * v / vt / vn records (first 3 / 2 / 3 floats)
//   * f records with v, v/vt, v//vn, v/vt/vn forms; n-gons fan-
//     triangulated like the reference ((0,i+1,i+2) fan)
//   * negative indices resolved relative to the current counts
//   * usemtl starts a new material group; material id recorded per face
//
// Build:  g++ -O3 -march=native -shared -fPIC objloader.cpp -o libobjloader.so

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <unordered_map>

namespace {

struct ObjData {
  std::vector<float> vertices;    // 3 per v
  std::vector<float> texcoords;   // 2 per vt
  std::vector<float> normals;     // 3 per vn
  std::vector<int> faces;         // 3 vertex ids per tri (0-based)
  std::vector<int> face_vt;       // 3 texcoord ids per tri (-1 if absent)
  std::vector<int> face_vn;       // 3 normal ids per tri (-1 if absent)
  std::vector<int> face_mat;      // material id per tri
  std::vector<std::string> materials;
  std::string mtllib;
};

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

struct Corner {
  int v, vt, vn;
};

inline int fix_index(long idx, size_t count) {
  // OBJ indices are 1-based; negative counts from the end
  if (idx > 0) return static_cast<int>(idx - 1);
  if (idx < 0) return static_cast<int>(count + idx);
  return -1;
}

bool parse_corner(const char*& p, const char* end, const ObjData& d, Corner* c) {
  char* q;
  long v = strtol(p, &q, 10);
  if (q == p) return false;
  p = q;
  c->v = fix_index(v, d.vertices.size() / 3);
  c->vt = -1;
  c->vn = -1;
  if (p < end && *p == '/') {
    ++p;
    if (p < end && *p != '/') {
      long vt = strtol(p, &q, 10);
      if (q != p) {
        c->vt = fix_index(vt, d.texcoords.size() / 2);
        p = q;
      }
    }
    if (p < end && *p == '/') {
      ++p;
      long vn = strtol(p, &q, 10);
      if (q != p) {
        c->vn = fix_index(vn, d.normals.size() / 3);
        p = q;
      }
    }
  }
  return true;
}

ObjData* parse(const char* buf, size_t len) {
  auto* d = new ObjData();
  const char* p = buf;
  const char* end = buf + len;
  int cur_mat = -1;
  std::unordered_map<std::string, int> mat_ids;
  std::vector<Corner> corners;
  corners.reserve(8);

  while (p < end) {
    p = skip_ws(p, end);
    const char* line_end = p;
    while (line_end < end && *line_end != '\n') ++line_end;

    if (p + 1 < end && p[0] == 'v' &&
        (p[1] == ' ' || p[1] == '\t')) {
      char* q;
      const char* s = p + 1;
      for (int k = 0; k < 3; ++k) {
        float f = strtof(s, &q);
        d->vertices.push_back(q == s ? 0.f : f);
        s = q;
      }
    } else if (p + 2 < end && p[0] == 'v' && p[1] == 't' &&
               (p[2] == ' ' || p[2] == '\t')) {
      char* q;
      const char* s = p + 2;
      for (int k = 0; k < 2; ++k) {
        float f = strtof(s, &q);
        d->texcoords.push_back(q == s ? 0.f : f);
        s = q;
      }
    } else if (p + 2 < end && p[0] == 'v' && p[1] == 'n' &&
               (p[2] == ' ' || p[2] == '\t')) {
      char* q;
      const char* s = p + 2;
      for (int k = 0; k < 3; ++k) {
        float f = strtof(s, &q);
        d->normals.push_back(q == s ? 0.f : f);
        s = q;
      }
    } else if (p + 1 < end && p[0] == 'f' &&
               (p[1] == ' ' || p[1] == '\t')) {
      const char* s = p + 1;
      corners.clear();
      while (true) {
        s = skip_ws(s, line_end);
        if (s >= line_end) break;
        Corner c;
        const char* s2 = s;
        if (!parse_corner(s2, line_end, *d, &c)) break;
        s = s2;
        corners.push_back(c);
      }
      // fan triangulation (matches the reference loaders)
      for (size_t i = 0; i + 2 < corners.size(); ++i) {
        const Corner tri[3] = {corners[0], corners[i + 1], corners[i + 2]};
        for (int k = 0; k < 3; ++k) {
          d->faces.push_back(tri[k].v);
          d->face_vt.push_back(tri[k].vt);
          d->face_vn.push_back(tri[k].vn);
        }
        d->face_mat.push_back(cur_mat);
      }
    } else if (line_end - p > 7 && strncmp(p, "usemtl", 6) == 0) {
      const char* s = skip_ws(p + 6, line_end);
      std::string name(s, line_end - s);
      while (!name.empty() &&
             (name.back() == '\r' || name.back() == ' ' || name.back() == '\t'))
        name.pop_back();
      auto it = mat_ids.find(name);
      if (it == mat_ids.end()) {
        cur_mat = static_cast<int>(d->materials.size());
        mat_ids.emplace(name, cur_mat);
        d->materials.push_back(name);
      } else {
        cur_mat = it->second;
      }
    } else if (line_end - p > 7 && strncmp(p, "mtllib", 6) == 0) {
      const char* s = skip_ws(p + 6, line_end);
      std::string name(s, line_end - s);
      while (!name.empty() &&
             (name.back() == '\r' || name.back() == ' ' || name.back() == '\t'))
        name.pop_back();
      d->mtllib = name;
    }
    p = next_line(line_end, end);
  }
  return d;
}

}  // namespace

extern "C" {

void* obj_parse_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  char* buf = static_cast<char*>(malloc(len));
  size_t got = fread(buf, 1, len, f);
  fclose(f);
  ObjData* d = parse(buf, got);
  free(buf);
  return d;
}

void* obj_parse_string(const char* buf, long len) {
  return parse(buf, static_cast<size_t>(len));
}

long obj_num_vertices(void* h) { return ((ObjData*)h)->vertices.size() / 3; }
long obj_num_texcoords(void* h) { return ((ObjData*)h)->texcoords.size() / 2; }
long obj_num_normals(void* h) { return ((ObjData*)h)->normals.size() / 3; }
long obj_num_faces(void* h) { return ((ObjData*)h)->faces.size() / 3; }
long obj_num_materials(void* h) { return ((ObjData*)h)->materials.size(); }

void obj_copy_vertices(void* h, float* out) {
  auto& v = ((ObjData*)h)->vertices;
  memcpy(out, v.data(), v.size() * sizeof(float));
}
void obj_copy_texcoords(void* h, float* out) {
  auto& v = ((ObjData*)h)->texcoords;
  memcpy(out, v.data(), v.size() * sizeof(float));
}
void obj_copy_normals(void* h, float* out) {
  auto& v = ((ObjData*)h)->normals;
  memcpy(out, v.data(), v.size() * sizeof(float));
}
void obj_copy_faces(void* h, int* out) {
  auto& v = ((ObjData*)h)->faces;
  memcpy(out, v.data(), v.size() * sizeof(int));
}
void obj_copy_face_vt(void* h, int* out) {
  auto& v = ((ObjData*)h)->face_vt;
  memcpy(out, v.data(), v.size() * sizeof(int));
}
void obj_copy_face_vn(void* h, int* out) {
  auto& v = ((ObjData*)h)->face_vn;
  memcpy(out, v.data(), v.size() * sizeof(int));
}
void obj_copy_face_mat(void* h, int* out) {
  auto& v = ((ObjData*)h)->face_mat;
  memcpy(out, v.data(), v.size() * sizeof(int));
}
const char* obj_material_name(void* h, long i) {
  return ((ObjData*)h)->materials[i].c_str();
}
const char* obj_mtllib(void* h) { return ((ObjData*)h)->mtllib.c_str(); }
void obj_free(void* h) { delete (ObjData*)h; }

}  // extern "C"
