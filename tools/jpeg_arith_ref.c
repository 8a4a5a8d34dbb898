/* Reference-encoder harness for the arithmetic-JPEG goldens.
 *
 * Uses the system libjpeg (libjpeg-turbo, the de-facto reference
 * implementation of ITU-T T.81 arithmetic coding) to
 *   encode  — compress a PGM/PPM into a sequential (SOF9) or
 *             progressive (SOF10) arithmetic-coded JPEG, with
 *             optional restart interval, subsampling and custom
 *             DC/AC conditioning (DAC segment);
 *   coef    — entropy-decode any JPEG with libjpeg itself and dump
 *             the exact quantized DCT coefficients per component
 *             (natural order), which tools/jpeg_arith_golden.py
 *             turns into expected pixels via the repo's shared
 *             integer IDCT spec.
 *
 * The committed fixtures in tools/fixtures/q_jpeg_arith/ were
 * produced by this harness, so graft's Scala QM-decoder
 * (JpegCodec SOF9/SOF10 paths) is graded end-to-end against an
 * INDEPENDENT implementation of T.81 Annexes D/F/G — nothing in the
 * golden pipeline shares code with the Scala decoder.
 *
 * Build:  gcc -O2 -o /tmp/jpeg_arith_ref tools/jpeg_arith_ref.c -ljpeg
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *msg) { fprintf(stderr, "%s\n", msg); exit(1); }

/* --------------------------------------------------- PNM reading */
static int pnm_int(FILE *f) {
  int c, v = 0;
  do {
    c = getc(f);
    if (c == '#') { while (c != '\n' && c != EOF) c = getc(f); }
  } while (c == ' ' || c == '\t' || c == '\n' || c == '\r');
  while (c >= '0' && c <= '9') { v = v * 10 + (c - '0'); c = getc(f); }
  return v;
}

static unsigned char *read_pnm(const char *path, int *w, int *h, int *nc) {
  FILE *f = fopen(path, "rb");
  if (!f) die("cannot open pnm");
  int p1 = getc(f), p2 = getc(f);
  if (p1 != 'P' || (p2 != '5' && p2 != '6')) die("not a P5/P6 pnm");
  *nc = (p2 == '6') ? 3 : 1;
  *w = pnm_int(f); *h = pnm_int(f);
  if (pnm_int(f) != 255) die("maxval must be 255");
  size_t n = (size_t)(*w) * (*h) * (*nc);
  unsigned char *buf = malloc(n);
  if (fread(buf, 1, n, f) != n) die("short pnm");
  fclose(f);
  return buf;
}

/* --------------------------------------------------------- encode */
static int cmd_encode(int argc, char **argv) {
  /* encode in.pnm out.jpg quality sub(444|420|422|gray) restart prog dcL dcU acKx */
  if (argc < 6) die("encode args");
  int w, h, nc;
  unsigned char *img = read_pnm(argv[0], &w, &h, &nc);
  int quality = atoi(argv[2]);
  const char *sub = argv[3];
  int restart = atoi(argv[4]);
  int prog = atoi(argv[5]);
  struct jpeg_compress_struct c;
  struct jpeg_error_mgr jerr;
  c.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&c);
  FILE *out = fopen(argv[1], "wb");
  if (!out) die("cannot open output");
  jpeg_stdio_dest(&c, out);
  c.image_width = w;
  c.image_height = h;
  c.input_components = nc;
  c.in_color_space = nc == 3 ? JCS_RGB : JCS_GRAYSCALE;
  jpeg_set_defaults(&c);
  jpeg_set_quality(&c, quality, TRUE);
  c.arith_code = TRUE;
  if (nc == 3) {
    int hs = 2, vs = 2;
    if (!strcmp(sub, "444")) { hs = 1; vs = 1; }
    else if (!strcmp(sub, "422")) { hs = 2; vs = 1; }
    c.comp_info[0].h_samp_factor = hs;
    c.comp_info[0].v_samp_factor = vs;
    c.comp_info[1].h_samp_factor = 1;
    c.comp_info[1].v_samp_factor = 1;
    c.comp_info[2].h_samp_factor = 1;
    c.comp_info[2].v_samp_factor = 1;
  }
  if (argc >= 9) { /* custom conditioning for every table slot */
    int dcL = atoi(argv[6]), dcU = atoi(argv[7]), acK = atoi(argv[8]);
    int i;
    for (i = 0; i < NUM_ARITH_TBLS; i++) {
      c.arith_dc_L[i] = (UINT8)dcL;
      c.arith_dc_U[i] = (UINT8)dcU;
      c.arith_ac_K[i] = (UINT8)acK;
    }
  }
  if (prog) jpeg_simple_progression(&c);
  if (restart) c.restart_interval = (unsigned)restart;
  jpeg_start_compress(&c, TRUE);
  while (c.next_scanline < c.image_height) {
    JSAMPROW row = img + (size_t)c.next_scanline * w * nc;
    jpeg_write_scanlines(&c, &row, 1);
  }
  jpeg_finish_compress(&c);
  jpeg_destroy_compress(&c);
  fclose(out);
  free(img);
  return 0;
}

/* ------------------------------------------------------ coef dump */
static int cmd_coef(const char *path) {
  struct jpeg_decompress_struct d;
  struct jpeg_error_mgr jerr;
  d.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&d);
  FILE *f = fopen(path, "rb");
  if (!f) die("cannot open jpg");
  jpeg_stdio_src(&d, f);
  jpeg_read_header(&d, TRUE);
  jvirt_barray_ptr *coefs = jpeg_read_coefficients(&d);
  if (!coefs) die("read_coefficients failed");
  printf("frame %u %u %d %d\n", d.image_width, d.image_height,
         d.num_components, d.progressive_mode ? 1 : 0);
  int ci;
  for (ci = 0; ci < d.num_components; ci++) {
    jpeg_component_info *comp = &d.comp_info[ci];
    printf("comp %d %d %d %u %u\n", ci, comp->h_samp_factor,
           comp->v_samp_factor, (unsigned)comp->width_in_blocks,
           (unsigned)comp->height_in_blocks);
    JDIMENSION by;
    for (by = 0; by < comp->height_in_blocks; by++) {
      JBLOCKARRAY rows = (d.mem->access_virt_barray)(
          (j_common_ptr)&d, coefs[ci], by, 1, FALSE);
      JDIMENSION bx;
      for (bx = 0; bx < comp->width_in_blocks; bx++) {
        int k;
        printf("block %u %u", by, bx);
        for (k = 0; k < 64; k++) printf(" %d", rows[0][bx][k]);
        printf("\n");
      }
    }
  }
  jpeg_finish_decompress(&d);
  jpeg_destroy_decompress(&d);
  fclose(f);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 8 && !strcmp(argv[1], "encode"))
    return cmd_encode(argc - 2, argv + 2);
  if (argc == 3 && !strcmp(argv[1], "coef"))
    return cmd_coef(argv[2]);
  die("usage: jpeg_arith_ref encode in.pnm out.jpg q sub restart prog "
      "[dcL dcU acKx] | coef in.jpg");
  return 1;
}
