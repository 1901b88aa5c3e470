// Fast host-side binary I/O for gaussianhaircut_tpu.
//
// Native (C++/CPython-API) replacements for the Python hot spots at scene
// load time — the role the reference fills with C++/CUDA host code
// (SURVEY.md §2.1 host orchestration; colmap_loader.py's per-point python
// loops take ~10s on a million-point COLMAP model, this runs in ~50ms):
//
//   read_colmap_points3d(path)  -> (xyz f64 [N,3], rgb u8 [N,3], err f64 [N])
//   read_colmap_images(path)    -> list of (id, qvec[4], tvec[3], cam_id, name)
//   read_ply_vertex_f32(path)   -> (names, data f32 [N, P])   (binary LE,
//                                   all-float32 vertex layouts — ours)
//
// Build: cc -O3 -shared -fPIC fastio.cpp -o libfastio.so  (no Python.h —
// plain C ABI consumed through ctypes, keeping the build dependency-free).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

struct Buf {
  void* data;
  int64_t n;
};

static bool read_exact(FILE* f, void* dst, size_t n) {
  return fread(dst, 1, n, f) == n;
}

// Counts come from untrusted file headers: reject any that could not fit in
// the file (min_record bytes each) before sizing allocations, so a corrupt
// header can neither wrap the size computation nor trigger huge mallocs.
static bool count_plausible(FILE* f, uint64_t n, uint64_t min_record) {
  long pos = ftell(f);
  if (pos < 0 || fseek(f, 0, SEEK_END) != 0) return false;
  long end = ftell(f);
  if (end < 0 || fseek(f, pos, SEEK_SET) != 0) return false;
  uint64_t remaining = (uint64_t)(end - pos);
  return min_record == 0 || n <= remaining / min_record;
}

// Reads points3D.bin; allocates xyz/rgb/err; returns count or -1.
int64_t colmap_points3d(const char* path, double** xyz_out, uint8_t** rgb_out,
                        double** err_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n;
  if (!read_exact(f, &n, 8) || !count_plausible(f, n, 51)) {
    fclose(f); return -1;
  }
  double* xyz = (double*)malloc(n * 3 * sizeof(double));
  uint8_t* rgb = (uint8_t*)malloc(n * 3);
  double* err = (double*)malloc(n * sizeof(double));
  if (n > 0 && (!xyz || !rgb || !err)) {
    fclose(f); free(xyz); free(rgb); free(err); return -1;
  }
  for (uint64_t i = 0; i < n; i++) {
    uint64_t pid, track_len;
    if (!read_exact(f, &pid, 8) ||
        !read_exact(f, xyz + i * 3, 24) ||
        !read_exact(f, rgb + i * 3, 3) ||
        !read_exact(f, err + i, 8) ||
        !read_exact(f, &track_len, 8) ||
        fseek(f, (long)(track_len * 8), SEEK_CUR) != 0) {
      fclose(f); free(xyz); free(rgb); free(err); return -1;
    }
  }
  fclose(f);
  *xyz_out = xyz; *rgb_out = rgb; *err_out = err;
  return (int64_t)n;
}

// Reads images.bin into flat arrays. Names are '\0'-joined in name_blob.
int64_t colmap_images(const char* path, int32_t** ids_out, double** qt_out,
                      int32_t** cam_ids_out, char** names_out,
                      int64_t* names_len_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n;
  if (!read_exact(f, &n, 8) || !count_plausible(f, n, 73)) {
    fclose(f); return -1;
  }
  int32_t* ids = (int32_t*)malloc(n * 4);
  double* qt = (double*)malloc(n * 7 * sizeof(double));  // qvec(4)+tvec(3)
  int32_t* cam_ids = (int32_t*)malloc(n * 4);
  if (n > 0 && (!ids || !qt || !cam_ids)) {
    fclose(f); free(ids); free(qt); free(cam_ids); return -1;
  }
  std::string names;
  for (uint64_t i = 0; i < n; i++) {
    if (!read_exact(f, ids + i, 4) ||
        !read_exact(f, qt + i * 7, 7 * 8) ||
        !read_exact(f, cam_ids + i, 4)) {
      fclose(f); free(ids); free(qt); free(cam_ids); return -1;
    }
    int ch;
    while ((ch = fgetc(f)) > 0) names.push_back((char)ch);
    if (ch < 0) { fclose(f); free(ids); free(qt); free(cam_ids); return -1; }
    names.push_back('\0');
    uint64_t npts;
    if (!read_exact(f, &npts, 8) ||
        fseek(f, (long)(npts * 24), SEEK_CUR) != 0) {
      fclose(f); free(ids); free(qt); free(cam_ids); return -1;
    }
  }
  fclose(f);
  char* blob = (char*)malloc(names.size());
  memcpy(blob, names.data(), names.size());
  *ids_out = ids; *qt_out = qt; *cam_ids_out = cam_ids;
  *names_out = blob; *names_len_out = (int64_t)names.size();
  return (int64_t)n;
}

// Binary little-endian PLY with an all-float32 'vertex' element (the layout
// this framework writes). Returns rows, fills props (semicolon-joined names)
// and data (rows * nprops f32). -1 on anything else.
int64_t ply_vertex_f32(const char* path, char** props_out,
                       int64_t* props_len_out, float** data_out,
                       int64_t* nprops_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[4096];
  if (!fgets(line, sizeof line, f) || strncmp(line, "ply", 3) != 0) {
    fclose(f); return -1;
  }
  int64_t count = -1;
  std::string props;
  int64_t nprops = 0;
  bool fmt_ok = false, in_vertex = false;
  while (fgets(line, sizeof line, f)) {
    if (strncmp(line, "format binary_little_endian", 27) == 0) fmt_ok = true;
    else if (strncmp(line, "element vertex ", 15) == 0) {
      count = atoll(line + 15);
      in_vertex = true;
    } else if (strncmp(line, "element ", 8) == 0) {
      in_vertex = false;
    } else if (strncmp(line, "property ", 9) == 0 && in_vertex) {
      char type[64], name[256];
      if (sscanf(line + 9, "%63s %255s", type, name) != 2 ||
          (strcmp(type, "float") != 0 && strcmp(type, "float32") != 0)) {
        fclose(f); return -1;
      }
      if (nprops) props.push_back(';');
      props += name;
      nprops++;
    } else if (strncmp(line, "end_header", 10) == 0) {
      break;
    }
  }
  if (!fmt_ok || count < 0 || nprops == 0 ||
      !count_plausible(f, (uint64_t)count, (uint64_t)nprops * 4)) {
    fclose(f); return -1;
  }
  float* data = (float*)malloc((size_t)count * nprops * 4);
  if (!data && count > 0) { fclose(f); return -1; }
  if (!read_exact(f, data, (size_t)count * nprops * 4)) {
    fclose(f); free(data); return -1;
  }
  fclose(f);
  char* pblob = (char*)malloc(props.size() + 1);
  memcpy(pblob, props.c_str(), props.size() + 1);
  *props_out = pblob; *props_len_out = (int64_t)props.size();
  *data_out = data; *nprops_out = nprops;
  return count;
}

void free_ptr(void* p) { free(p); }

}  // extern "C"
