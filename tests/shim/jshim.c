/* Minimal flat-API shim over the system libjpeg, compiled at test time
 * (tests/test_jpeg.py) to cross-validate the repo's pure-Python codec
 * against a real independent implementation.  Not part of the engine. */
#include <stddef.h>
#include <stdio.h>
#include <setjmp.h>
#include <string.h>
#include <stdlib.h>
#include <jpeglib.h>

struct err_jmp { struct jpeg_error_mgr mgr; jmp_buf env; };

static void on_error(j_common_ptr cinfo) {
  struct err_jmp *e = (struct err_jmp *) cinfo->err;
  longjmp(e->env, 1);
}

/* Encode interleaved RGB -> JPEG.  mode: 0 = baseline Huffman,
 * 1 = sequential arithmetic, 2 = progressive Huffman,
 * 3 = progressive arithmetic.  Returns byte count or -1. */
long jshim_encode(const unsigned char *rgb, int w, int h, int quality,
                  int mode, int subsample, unsigned char *out, long outcap) {
  struct jpeg_compress_struct c;
  struct err_jmp jerr;
  unsigned char *buf = NULL;
  unsigned long buflen = 0;
  long ret = -1;
  int y;

  c.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = on_error;
  if (setjmp(jerr.env)) { jpeg_destroy_compress(&c); free(buf); return -1; }
  jpeg_create_compress(&c);
  jpeg_mem_dest(&c, &buf, &buflen);
  c.image_width = w; c.image_height = h;
  c.input_components = 3; c.in_color_space = JCS_RGB;
  jpeg_set_defaults(&c);
  jpeg_set_quality(&c, quality, TRUE);
  if (mode == 1 || mode == 3) c.arith_code = TRUE;
  if (mode == 2 || mode == 3) jpeg_simple_progression(&c);
  if (!subsample) {
    c.comp_info[0].h_samp_factor = 1;
    c.comp_info[0].v_samp_factor = 1;
  }
  jpeg_start_compress(&c, TRUE);
  for (y = 0; y < h; y++) {
    JSAMPROW row = (JSAMPROW) (rgb + (size_t) y * w * 3);
    jpeg_write_scanlines(&c, &row, 1);
  }
  jpeg_finish_compress(&c);
  if ((long) buflen <= outcap) {
    memcpy(out, buf, buflen);
    ret = (long) buflen;
  }
  jpeg_destroy_compress(&c);
  free(buf);
  return ret;
}

/* Decode JPEG -> interleaved RGB.  Returns (w << 20) | h or -1. */
long jshim_decode(const unsigned char *jpg, long n,
                  unsigned char *out, long outcap) {
  struct jpeg_decompress_struct d;
  struct err_jmp jerr;
  long ret = -1;

  d.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = on_error;
  if (setjmp(jerr.env)) { jpeg_destroy_decompress(&d); return -1; }
  jpeg_create_decompress(&d);
  jpeg_mem_src(&d, (unsigned char *) jpg, (unsigned long) n);
  jpeg_read_header(&d, TRUE);
  d.out_color_space = JCS_RGB;
  jpeg_start_decompress(&d);
  if ((long) d.output_width * d.output_height * 3 > outcap) {
    jpeg_destroy_decompress(&d);
    return -1;
  }
  while (d.output_scanline < d.output_height) {
    JSAMPROW row = out + (size_t) d.output_scanline * d.output_width * 3;
    jpeg_read_scanlines(&d, &row, 1);
  }
  ret = ((long) d.output_width << 20) | d.output_height;
  jpeg_finish_decompress(&d);
  jpeg_destroy_decompress(&d);
  return ret;
}
